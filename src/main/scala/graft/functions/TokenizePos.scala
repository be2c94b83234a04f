package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** G3 — the true UDTF surface: a Catalyst Generator emitting one
  * (tok, pos) row per single-space token of the input string, usable via
  * `LATERAL VIEW tokenize_pos(text) t AS tok, pos`. Equivalent to
  * posexplode(split(...)) but demonstrates the custom-Generator
  * extension point (custom 1→N operators that explode/inline can't
  * express). CodegenFallback is acceptable here: generators sit at
  * pipeline starts and the per-row fan-out dominates cost. */
case class TokenizePos(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("tok", StringType, nullable = false),
    StructField("pos", IntegerType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      // limit -1: Java's default split DROPS trailing empty tokens,
    // which Spark's split()/DuckDB's string_split keep — the scaladoc
    // equivalence claim was false for trailing-space text (r4 review)
    val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
      toks.iterator.zipWithIndex.map { case (t, i) =>
        InternalRow(UTF8String.fromString(t), i)
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): TokenizePos =
    copy(child = newChild)
}
