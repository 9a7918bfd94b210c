"""Index aliases: named indirection over index directories with atomic
multi-action swap — the ES ``_aliases`` API and its zero-downtime reindex
contract.

In ES, an alias is a cluster-level name -> index pointer and one
``POST _aliases {"actions": [...]}`` call applies remove+add ATOMICALLY, so
clients querying the alias flip from the old index to the new one with no
window where the name resolves to nothing (or to both). That is the
blue/green migration runbook every ``_reindex`` ends with, and the reason
the reference can hardcode one index name in its config
(reference: internal/elasticsearch/esManager.go:43-90 PUTs mappings for the
fixed names ``picdexer``/``picdexer_fs``; a production deployment fronts
those with aliases to allow reindex-then-swap).

Our registry is one ``aliases.json`` beside the index directories,
committed via the same ``os.replace`` protocol as the snapshot MANIFEST
(sources/catalog.py:116-121): readers see the old file or the new file,
never a partial write, and a crash mid-update leaves the previous state
intact. Scale shape: the file is alias-count-sized (metadata, not data) and
only the coordinator touches it — executors never read it.

Divergences from ES, pinned deliberately:
- one alias -> exactly ONE index. ES lets an alias fan out to many indices
  for cross-index search; this engine's tables are per-index-dir and a
  silent multi-target union would change scoring statistics, so ``add`` on
  an alias that already points elsewhere REFUSES unless the same atomic
  batch removes it first (the swap idiom stays one call).
- ``remove`` of an unknown alias refuses (ES 8 semantics with the default
  ``must_exist`` behaviour for explicit alias names).
"""

from __future__ import annotations

import json
import os


class AliasRegistry:
    """The ``_aliases`` store rooted at a directory of index dirs."""

    def __init__(self, root_dir: str):
        self.root_dir = root_dir
        self.path = os.path.join(root_dir, "aliases.json")

    # ---- state ----------------------------------------------------------
    def read(self) -> dict[str, str]:
        """alias -> index dir (as stored; relative paths are relative to
        the registry root)."""
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def _write(self, aliases: dict[str, str]) -> None:
        os.makedirs(self.root_dir, exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(aliases, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)  # atomic commit point

    # ---- the _aliases API ----------------------------------------------
    def update(self, actions: list[dict]) -> dict[str, str]:
        """Apply ES-shaped actions ATOMICALLY (all or nothing, one write):

            [{"remove": {"alias": "prod", "index": "idx_v1"}},
             {"add":    {"alias": "prod", "index": "idx_v2"}}]

        ``remove`` may omit ``index`` (drop wherever it points); when given,
        it must match the current target (catches a stale-runbook swap).
        Returns the post-update alias map.
        """
        aliases = self.read()
        for action in actions:
            if len(action) != 1:
                raise ValueError(f"one verb per action, got {action!r}")
            verb, body = next(iter(action.items()))
            alias = body.get("alias")
            if not alias:
                raise ValueError(f"action missing 'alias': {action!r}")
            if verb == "add":
                index = body.get("index")
                if not index:
                    raise ValueError(f"add missing 'index': {action!r}")
                cur = aliases.get(alias)
                if cur is not None and cur != index:
                    raise ValueError(
                        f"alias {alias!r} already points at {cur!r}; this "
                        "engine pins one index per alias — remove it in the "
                        "same update to swap"
                    )
                if not os.path.isdir(self._abs(index)):
                    raise FileNotFoundError(
                        f"alias target {index!r} is not a directory under "
                        f"{self.root_dir!r}"
                    )
                aliases[alias] = index
            elif verb == "remove":
                if alias not in aliases:
                    raise KeyError(f"alias {alias!r} does not exist")
                index = body.get("index")
                if index is not None and aliases[alias] != index:
                    raise ValueError(
                        f"alias {alias!r} points at {aliases[alias]!r}, "
                        f"not {index!r} — refusing the mismatched remove"
                    )
                del aliases[alias]
            else:
                raise ValueError(f"unknown action verb {verb!r}")
        self._write(aliases)
        return aliases

    def swap(self, alias: str, new_index: str) -> dict[str, str]:
        """The canonical post-reindex promotion: point ``alias`` at
        ``new_index`` in one atomic update (remove-if-present + add)."""
        actions: list[dict] = []
        if alias in self.read():
            actions.append({"remove": {"alias": alias}})
        actions.append({"add": {"alias": alias, "index": new_index}})
        return self.update(actions)

    # ---- resolution -----------------------------------------------------
    def _abs(self, index: str) -> str:
        return index if os.path.isabs(index) else \
            os.path.join(self.root_dir, index)

    def resolve(self, name: str) -> str:
        """Alias -> absolute index dir; a non-alias name resolves to itself
        (as a path under the root, absolute if given absolute) so callers
        can accept either — exactly how every ES endpoint takes
        ``<index-or-alias>``."""
        aliases = self.read()
        if name in aliases:
            return self._abs(aliases[name])
        return self._abs(name)
