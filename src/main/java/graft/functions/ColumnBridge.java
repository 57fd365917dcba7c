package graft.functions;

import org.apache.spark.sql.Column;
import org.apache.spark.sql.catalyst.expressions.Expression;

/**
 * Column &lt;-&gt; Expression bridge. Spark 4's Column wraps a ColumnNode and
 * the converters live in {@code org.apache.spark.sql.classic.ExpressionUtils},
 * which is {@code private[sql]} at the Scala level but public in bytecode —
 * calling it from Java is the supported-bytecode, compile-checked way to
 * attach custom Catalyst expressions to the public Column API.
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
