"""``python -m ds_floodexposure_monitoring_spark`` → the CLI."""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
