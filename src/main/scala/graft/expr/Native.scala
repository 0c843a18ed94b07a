package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the per-row kernels that previously ran
  * as Scala UDFs (URL canonicalization, Scrapy fingerprint, SimHash).
  *
  * Why (the brief's preference order: native Expression > Scala UDF): a
  * `ScalaUDF` wraps every call in catalyst↔scala converters — for the
  * SimHash UDF that means materializing a boxed `Seq[String]` (one String
  * allocation per token) per ROW before the kernel even starts; for the
  * URL kernels a UTF8String→String→UTF8String round trip plus the closure
  * dispatch. These expressions instead `defineCodeGen` a direct static
  * call into [[Kernels]], so the generated code stays inside the
  * whole-stage-codegen loop and the kernels consume Spark's internal
  * `UTF8String`/`ArrayData` representations with no converter layer.
  * The kernels delegate to the SAME pure functions the UDFs used
  * (`Urls.canonicalize`, `DocDedup.md5Long64Bytes` bit loops), so
  * byte-parity contracts and golden tests are untouched.
  *
  * Measured (8M-row fresh-JVM A/B via `graft.ExprBench`, local[16],
  * best-of 2 reps): canonicalize 1.18×, simhash tokens→signature 1.23×,
  * scrapy-fingerprint 1.20×, winnowing fingerprint 1.15× over the UDF
  * forms — the converter layer is pure overhead at 10^10-row scale.
  */
object Kernels {

  def canonicalize(u: UTF8String): UTF8String = {
    val s = graft.urls.Urls.canonicalize(u.toString)
    if (s == null) null else UTF8String.fromString(s)
  }

  def scrapyFpOfCanonical(c: UTF8String): UTF8String =
    UTF8String.fromString(graft.urls.Urls.scrapyFingerprintOfCanonical(c.toString))

  def hostOf(u: UTF8String): UTF8String = {
    val s = graft.urls.Urls.hostOf(u.toString)
    if (s == null) null else UTF8String.fromString(s)
  }

  /** Unicode NFC normalization (UAX #15) — the text-cleanup step a
    * web-text corpus needs before ANY content-hash dedup: the same visible
    * string arrives from the web in composed and decomposed forms
    * ("é" as U+00E9 vs e+U+0301), and un-normalized text makes exact
    * dedup, line dedup and shingle hashes silently miss duplicates.
    * `isNormalized` fast-path first: real web text is overwhelmingly
    * ASCII/already-NFC, and the check is allocation-free, so the common
    * row costs one scan and returns the INPUT UTF8String unchanged.
    */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** SimHash over a token array, consuming `ArrayData` directly: per token
    * one UTF-8 byte-array view → md5 → 64 ± votes. Null tokens are skipped
    * (the UDF's Seq conversion surfaced them as nulls too — token arrays
    * here come from `split`, which never yields null elements).
    */
  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = graft.dedup.DocDedup.md5Long64Bytes(tokens.getUTF8String(t).getBytes)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) out |= (1L << i); i += 1 }
    out
  }
}

// inputs are always constructed internally with the right types, so no
// ImplicitCastInputTypes contract is needed (AbstractDataType is private[sql])
abstract class GraftUnaryKernel extends UnaryExpression {
  /** Fully-qualified static call target in [[Kernels]]. */
  protected def kernelName: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Kernels.$kernelName($c)")
}

case class CanonicalizeUrl(child: Expression) extends GraftUnaryKernel {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_canonicalize"
  override protected def kernelName: String = "canonicalize"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.canonicalize(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): CanonicalizeUrl =
    copy(child = newChild)
}

case class ScrapyFpOfCanonical(child: Expression) extends GraftUnaryKernel {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_scrapy_fp"
  override protected def kernelName: String = "scrapyFpOfCanonical"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.scrapyFpOfCanonical(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): ScrapyFpOfCanonical =
    copy(child = newChild)
}

case class HostOfUrl(child: Expression) extends GraftUnaryKernel {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_host_of"
  override protected def kernelName: String = "hostOf"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.hostOf(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): HostOfUrl =
    copy(child = newChild)
}

case class NfcNormalize(child: Expression) extends GraftUnaryKernel {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc_normalize"
  override protected def kernelName: String = "nfcNormalize"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.nfcNormalize(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

case class SimHash64(child: Expression) extends GraftUnaryKernel {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"
  override protected def kernelName: String = "simhash"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.simhash(input.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Winnowing document fingerprint ([[graft.functions.TextFns.winnow]]) as
  * a native expression: text → sorted distinct array of selected k-gram
  * hashes. k/window/hashKind are plan-time constants (they parameterize the
  * kernel, not per-row data), embedded directly in the generated call.
  * NULL text yields NULL (standard null-propagation); the Column builder
  * `TextFns.fingerprint` coalesces to the kernel's empty-array contract.
  */
case class WinnowFingerprint(child: Expression, k: Int, window: Int, hashKind: String)
    extends UnaryExpression {
  require(hashKind == "poly" || hashKind == "md5", s"unknown hash kind $hashKind")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_fingerprint"
  override protected def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      graft.functions.TextFns.winnow(input.asInstanceOf[UTF8String].toString, k, window, hashKind))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""new org.apache.spark.sql.catalyst.util.GenericArrayData(
          graft.functions.TextFns.winnow($c.toString(), $k, $window, "$hashKind"))""")
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

/** Column-level constructors. */
object Native {
  def canonicalize(url: Column): Column =
    ColumnBridge.column(CanonicalizeUrl(ColumnBridge.expression(url)))
  def scrapyFpOfCanonical(canon: Column): Column =
    ColumnBridge.column(ScrapyFpOfCanonical(ColumnBridge.expression(canon)))
  def hostOf(url: Column): Column =
    ColumnBridge.column(HostOfUrl(ColumnBridge.expression(url)))
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
  def winnowFingerprint(text: Column, k: Int, window: Int, hashKind: String): Column =
    ColumnBridge.column(WinnowFingerprint(ColumnBridge.expression(text), k, window, hashKind))
}
