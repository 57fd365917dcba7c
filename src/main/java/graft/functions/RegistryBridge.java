package graft.functions;

import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry;

/**
 * SparkSession -&gt; FunctionRegistry bridge. {@code sessionState} is
 * {@code private[sql]} at the Scala level but public in bytecode (same
 * situation as {@link ColumnBridge}); going through Java keeps the call
 * compile-checked against the real signatures.
 */
public final class RegistryBridge {
  private RegistryBridge() {}

  public static FunctionRegistry registry(SparkSession s) {
    return ((org.apache.spark.sql.classic.SparkSession) s)
        .sessionState().functionRegistry();
  }
}
