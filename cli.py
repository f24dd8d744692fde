"""spark-submit entry shim: spark-submit --py-files dist/catalogue_pipeline_spark.zip cli.py <cmd> ..."""
import sys

from catalogue_pipeline_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main())
