"""Thin spark-submit driver file: the package itself ships via --py-files.

    spark-submit --py-files dist/engine.zip cli_main.py pagerank --edges ... --out ...
"""

import sys

from scalemine_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
