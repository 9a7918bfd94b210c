"""`python -m picdexer_spark ...` — see picdexer_spark/cli.py."""

import sys

from picdexer_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
