from wing_binlog_go_spark.plans.relational import QUERIES, QuerySpec  # noqa: F401
