"""``python -m map_reduce_server_spark`` entry point."""

from map_reduce_server_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
