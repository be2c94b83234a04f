package graft.stream;

import org.apache.spark.rdd.RDD;
import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.types.StructType;

/**
 * Bridges the one {@code private[sql]} method the V1 streaming Source
 * contract requires: {@code getBatch} must return a DataFrame whose
 * logical plan carries {@code isStreaming = true} (MicroBatchExecution
 * asserts it), and the only way to build one from a computed
 * InternalRow RDD is {@code SparkSession.internalCreateDataFrame} —
 * which Scala's access check hides outside the {@code sql} package but
 * the JVM exposes as a public method. External connectors that ship V1
 * sources (Delta's DeltaSource being the canonical example) rely on the
 * same entry point; a one-method Java shim keeps the access explicit
 * and greppable instead of scattering package-name tricks.
 */
public final class SparkShims {
  private SparkShims() {}

  public static Dataset<Row> internalCreateStreamingFrame(
      SparkSession spark, RDD<InternalRow> rdd, StructType schema) {
    return ((org.apache.spark.sql.classic.SparkSession) spark)
        .internalCreateDataFrame(rdd, schema, true);
  }

  /**
   * The inverse direction, for the V1 {@code Sink.addBatch} contract:
   * the micro-batch DataFrame arrives flagged streaming (so
   * {@code df.write} refuses it); re-wrapping its computed InternalRow
   * RDD as a plain batch frame lets the sink drive ordinary batch
   * writers — the shape Delta's sink uses.
   */
  public static Dataset<Row> internalCreateBatchFrame(
      SparkSession spark, RDD<InternalRow> rdd, StructType schema) {
    return ((org.apache.spark.sql.classic.SparkSession) spark)
        .internalCreateDataFrame(rdd, schema, false);
  }
}
