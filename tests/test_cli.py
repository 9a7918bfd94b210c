"""CLI (cmd/root.go surface): full -> search -> setup -> delete-by-query ->
compact against a temp index, plus the exit-code contract (0 ok, 1 conf
failure, 2 exec failure — reference cmd/root.go:10-13, full_test.go:8-22).

main() is invoked in-process (the reference's cobra tests do the same via
doFull with an injected run function); the session fixture's Spark is
reused because get_spark returns the active session.
"""

import json
import os

import pytest

from picdexer_spark.cli import main
from picdexer_spark.fixtures.pages import gen_pages


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cliidx")
    pages_dir = str(root / "pages")
    pdf = gen_pages(300, seed=41)
    spark.createDataFrame(pdf).write.parquet(pages_dir)
    conf = {
        "loggingLevel": "WARN",
        "index": {"dir": str(root / "index"), "shardRange": 128,
                  "storePositions": True},
        # no spark.master override: get_spark reuses the session fixture
        "dropzone": {"root": str(root / "drop"),
                     "checkpoint": str(root / "ckpt")},
    }
    conf_path = str(root / "conf.json")
    with open(conf_path, "w") as f:
        json.dump(conf, f)
    return conf_path, pages_dir, conf


def test_full_then_search_then_setup(env, capsys):
    conf_path, pages_dir, conf = env
    assert main(["full", "-c", conf_path, "-d", pages_dir,
                 "-i", "imp-cli"]) == 0
    out = capsys.readouterr().out
    assert "indexed 300 docs" in out
    # idempotent redelivery: same import id + dir is a no-op (the
    # content-addressed identity contract, common.go:44-63)
    assert main(["full", "-c", conf_path, "-d", pages_dir,
                 "-i", "imp-cli"]) == 0
    assert "skipped" in capsys.readouterr().out

    assert main(["search", "-c", conf_path, "-q", "w0 OR w1", "-k",
                 "5"]) == 0
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]
    assert len(lines) == 5
    doc_id, score, url = lines[0].split("\t")
    assert url.startswith("https://")
    assert float(score) > 0

    # boolean query strings ride the same path
    assert main(["search", "-c", conf_path, "-q",
                 "(w0 OR w1) AND w2"]) == 0
    assert capsys.readouterr().out.strip()

    # --simple: the Kibana KQL-off toggle — forgiving parser, CNF ops
    assert main(["search", "-c", conf_path, "-q", "w0 | w1 + w2",
                 "--simple", "-k", "3"]) == 0
    assert len(capsys.readouterr().out.splitlines()) == 3
    # a query that would be a kuery SYNTAX ERROR is fine under --simple
    assert main(["search", "-c", conf_path, "-q", "(((",
                 "--simple"]) == 0
    assert capsys.readouterr().out.strip() == ""  # no hits, no error

    assert main(["setup", "-c", conf_path]) == 0
    views = capsys.readouterr().out.split()
    assert "dash_doc_count" in views


def test_delete_by_query_and_compact(env, capsys):
    conf_path, _pages, conf = env
    assert main(["delete-by-query", "-c", conf_path, "-q",
                 "lang:de *"]) == 0
    out = capsys.readouterr().out
    assert out.startswith("deleted ")
    assert main(["compact", "-c", conf_path]) == 0
    assert "compacted to snapshot" in capsys.readouterr().out
    # deleted language stays gone after compact
    assert main(["search", "-c", conf_path, "-q", "lang:de *"]) == 0
    assert capsys.readouterr().out.strip() == ""
    # time travel: the pre-delete snapshot still serves the old corpus
    assert main(["search", "-c", conf_path, "-q", "lang:de *",
                 "--snapshot", "snap-000001"]) == 0
    assert capsys.readouterr().out.strip() != ""


def test_exit_codes(env, tmp_path, capsys):
    conf_path, pages_dir, _conf = env
    # conf failure: missing file / malformed / missing index.dir -> 1
    assert main(["setup", "-c", str(tmp_path / "nope.json")]) == 1
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert main(["setup", "-c", str(bad)]) == 1
    noidx = tmp_path / "noidx.json"
    noidx.write_text(json.dumps({"spark": {}}))
    assert main(["setup", "-c", str(noidx)]) == 1
    capsys.readouterr()
    # execution failure (bad input dir) -> 2
    empty_conf = tmp_path / "c.json"
    empty_conf.write_text(json.dumps(
        {"index": {"dir": str(tmp_path / "idx2")}}))
    assert main(["full", "-c", str(empty_conf), "-d",
                 str(tmp_path / "missing-dir"), "-i", "x"]) == 2
    # dropzone without root/checkpoint -> conf failure
    assert main(["dropzone", "-c", str(empty_conf)]) == 1
    capsys.readouterr()


def test_logging_level_conf(env, spark, tmp_path, capsys):
    """conf loggingLevel parity (conf.go:10 + common.go:9-19): an
    unparsable level is a CONFIGURATION failure before any work; a
    valid one is applied to the session for the command."""
    conf_path, _pages, conf = env
    bad = dict(conf, loggingLevel="chatty")
    bad_path = tmp_path / "badlvl.json"
    bad_path.write_text(json.dumps(bad))
    assert main(["setup", "-c", str(bad_path)]) == 1
    assert "logging level" in capsys.readouterr().err
    lvl_conf = dict(conf, loggingLevel="error")  # case-insensitive
    lvl_path = tmp_path / "errlvl.json"
    lvl_path.write_text(json.dumps(lvl_conf))
    assert main(["setup", "-c", str(lvl_path)]) == 0
    capsys.readouterr()
    jvm_lvl = spark._jvm.org.apache.logging.log4j.LogManager \
        .getRootLogger().getLevel().toString()
    assert jvm_lvl == "ERROR"
    spark.sparkContext.setLogLevel("WARN")  # restore for the suite


def test_dropzone_once(env, spark, capsys):
    """The stream must actually ingest: drop ONE parquet FILE (the file
    source lists files, not Spark output directories), run --once, and
    assert the committed doc count grew by the batch size. Regression for
    the round-4 arg-swap bug where the IndexConfig became the checkpoint
    path and the stream crashed without indexing anything."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from picdexer_spark.fixtures.pages import PAGES_SCHEMA
    from picdexer_spark.query.bm25 import SearchEngine

    conf_path, pages_dir, conf = env
    idx_dir = conf["index"]["dir"]
    n_before = SearchEngine(spark, idx_dir).n_docs
    os.makedirs(conf["dropzone"]["root"], exist_ok=True)
    pdf = gen_pages(50, seed=77)
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=PAGES_SCHEMA, preserve_index=False),
        os.path.join(conf["dropzone"]["root"], "batch0.parquet"))
    assert main(["dropzone", "-c", conf_path, "--once"]) == 0
    assert SearchEngine(spark, idx_dir).n_docs == n_before + 50
    # the configured checkpoint was really used (exactly-once offsets live
    # there, so a restart with no new files must be a no-op)
    assert os.path.isdir(os.path.join(conf["dropzone"]["checkpoint"],
                                      "offsets"))
    from picdexer_spark.sources.catalog import IndexCatalog
    chain = IndexCatalog(idx_dir).parent_chain()
    assert main(["dropzone", "-c", conf_path, "--once"]) == 0
    assert IndexCatalog(idx_dir).parent_chain() == chain


def test_conf_stopwords(env, tmp_path, capsys):
    """index.stopwords rides the conf like the reference's JSON options:
    a bad entry is a CONF failure (exit 1, before Spark); a good set
    builds a stop-filtered index the search side then honors."""
    conf_path, pages_dir, conf = env
    bad = dict(conf, index=dict(conf["index"],
                                dir=str(tmp_path / "bad_idx"),
                                stopwords=["not a token"]))
    bad_path = tmp_path / "bad_stop.json"
    bad_path.write_text(json.dumps(bad))
    assert main(["setup", "-c", str(bad_path)]) == 1
    assert "stopword" in capsys.readouterr().err
    good = dict(conf, index=dict(conf["index"],
                                 dir=str(tmp_path / "stop_idx"),
                                 stopwords=["w0"]))
    good_path = tmp_path / "stop.json"
    good_path.write_text(json.dumps(good))
    assert main(["full", "-c", str(good_path), "-d", pages_dir,
                 "-i", "imp-stop"]) == 0
    capsys.readouterr()
    # the stopped term is analyzed away: bare `w0` matches nothing,
    # and `w0 AND w1`-style conjunction degrades to the live term
    assert main(["search", "-c", str(good_path), "-q", "w0"]) == 0
    out = capsys.readouterr().out
    assert "0 hits" in out or out.strip().endswith("hits: 0") or \
        "doc_id" not in out


def test_cli_stats(env, capsys):
    """`stats` prints the _cat/_stats one-liner for the current index."""
    conf_path, pages_dir, conf = env
    assert main(["full", "-c", str(conf_path), "-d", pages_dir,
                 "-i", "imp-st"]) == 0
    capsys.readouterr()
    assert main(["stats", "-c", str(conf_path)]) == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    st = json.loads(line)
    assert st["live_docs"] > 0 and st["segments"] >= 1
    assert st["postings_rows"] > 0
    assert set(st) >= {"snapshot_id", "n_docs", "deleted_docs", "avgdl",
                       "positions", "url_field", "stopwords"}
