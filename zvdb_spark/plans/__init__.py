from zvdb_spark.plans.audit import explain_str, plan_audit  # noqa: F401
