"""go_mysql_transfer_ray — a Ray-Data-native CDC / incremental-ingest engine.

From-scratch re-expression of wj596/go-mysql-transfer's capabilities
(reference at /root/reference, cited per-module as file:line) as idiomatic
``ray.data.Dataset`` pipelines: a synthetic MySQL binlog/GTID event stream
over a Parquet table of source-code repositories is replayed through

  decode (stateless map_batches, Arrow)        ~ canal RowsEvent parsing
  rule engine (actor pool map_batches)         ~ YAML rule / Lua transforms
  keyed upsert merge (combiner + one shuffle)  ~ sink insert/update/delete
  lake writer (per-partition Parquet+manifest) ~ positionStorage checkpoint

with schema evolution (DDL-driven widening), exactly-once GTID fencing and
per-partition resumable manifests.

No module in this package calls ``ray.init`` / ``ray.shutdown`` — sessions
are owned by bench.py / pytest fixtures / the driver.
"""

__version__ = "0.1.0"
