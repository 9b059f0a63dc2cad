import sys

from ts_etl_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
