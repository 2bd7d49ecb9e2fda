"""spark-submit shim: the driver-side script named on the spark-submit
command line; all engine code ships via --py-files (see cli.py's
module docstring for the full deployment recipe)."""

import sys

from ds_floodexposure_monitoring_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
