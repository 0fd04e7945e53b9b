package graft.functions;

import org.apache.spark.sql.Column;
import org.apache.spark.sql.catalyst.expressions.Expression;

/**
 * Java bridge to {@code ExpressionUtils.column}, which is {@code
 * private[sql]} in Scala but public in bytecode. This is the supported
 * classic-API way to wrap a custom Catalyst {@link Expression} into a
 * user-facing {@link Column} in Spark 4.x; going through Java keeps us off
 * the Scala access modifier without shadowing Spark packages.
 */
public final class ColumnBridge {
  private ColumnBridge() {}

  public static Column column(Expression e) {
    return org.apache.spark.sql.classic.ExpressionUtils.column(e);
  }

  public static Expression expression(Column c) {
    return org.apache.spark.sql.classic.ExpressionUtils.expression(c);
  }
}
