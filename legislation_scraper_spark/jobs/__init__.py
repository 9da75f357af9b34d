"""spark-submit entrypoints (ship with --py-files lss_pyfiles.zip)."""
