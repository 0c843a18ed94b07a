package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** COMPILE FENCE for the repo's single private-API dependency (pinned in
  * ARCHITECTURE.md "Catalyst posture"): `ColumnBridge` delegates to the
  * `private[sql]` `org.apache.spark.sql.classic.ExpressionUtils`
  * converters. If a Spark upgrade moves or renames that class, this spec
  * and the bridge stop COMPILING — the failure is loud and points here.
  * Remediation (documented in ARCHITECTURE.md): register the native
  * expressions through the public per-session `FunctionRegistry` and build
  * Columns via `expr(...)`, or revert call sites to the retained UDF forms
  * at the measured 1.15–1.23× cost.
  */
class NativeExprFenceSpec extends SparkSpec {

  test("ColumnBridge round-trips Column <-> Expression (the private-API pin)") {
    val e = ColumnBridge.expression(lit(41) + lit(1))
    assert(e.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression])
    val out = spark.range(1).select(ColumnBridge.column(e).as("v")).head.getInt(0)
    assert(out === 42)
  }

  test("every native expression constructs a Column through the bridge") {
    // the four production call sites the pin protects — if the bridge
    // breaks, these are the columns that must move to the fallback path
    import graft.expr.Native
    val df = spark.range(1).selectExpr(
      "'http://A.com/x?b=2&a=1#f' AS u", "'tok tok2' AS t")
    val row = df.select(
      Native.canonicalize(col("u")).as("c"),
      Native.winnowFingerprint(col("t"), 3, 4, "poly").as("fp"))
      .head
    assert(row.getString(0).nonEmpty)
    assert(row.getSeq[Long](1) != null)
  }
}
