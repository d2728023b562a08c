from thundercats_spark.plans.audit import audit_df, audit_plan

__all__ = ["audit_plan", "audit_df"]
