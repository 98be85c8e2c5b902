#!/usr/bin/env python
"""spark-submit application script for the engine CLI.

spark-submit takes a script path (it has no `-m` module mode); this thin
runner is that script — all real code ships in the --py-files zip built
by scripts/make_pyfiles_zip.py:

    spark-submit --master <cluster> \
        --py-files dist/dataflow_opinion_analysis_spark.zip \
        scripts/submit_cli.py <index|stream|statscalc|socialstats|...> ...
"""

import sys

from dataflow_opinion_analysis_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
