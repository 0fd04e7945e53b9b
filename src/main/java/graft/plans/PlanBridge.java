package graft.plans;

import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;

/**
 * Java bridge to {@code Dataset.ofRows}, which is {@code private[sql]} in
 * Scala but public in bytecode — the classic-API way to wrap a custom
 * {@link LogicalPlan} into a user-facing {@code DataFrame} (same pattern
 * as {@link graft.functions.ColumnBridge} for expressions).
 */
public final class PlanBridge {
  private PlanBridge() {}

  public static Dataset<Row> ofRows(SparkSession spark, LogicalPlan plan) {
    return org.apache.spark.sql.classic.Dataset$.MODULE$.ofRows(
        (org.apache.spark.sql.classic.SparkSession) spark, plan);
  }
}
