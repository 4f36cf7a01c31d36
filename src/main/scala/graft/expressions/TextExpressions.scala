package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Minimum w-shingle MD5 fingerprint of a normalized (single-spaced)
  * text column, fused into ONE compiled pass: tokenize → w-token
  * windows → md5 per window → min of the 15-hex-char (60-bit) prefix.
  *
  * Replaces a chain of interpreted `zip_with`/`transform` HOF lambdas
  * (the round-1 x4 hot spot). MD5 (not xxhash64) so the DuckDB oracle
  * can reproduce the value: `CAST('0x' || substr(md5(s),1,15) AS
  * BIGINT)` on the same shingle strings.
  *
  * Winnowing-style robust fingerprint semantics per reference
  * bertrand/util/string.pyx (content hashing) — stable under small
  * edits: the minimum shingle usually survives. */
case class ShingleMinMd5(child: Expression, w: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_shingle_min_md5"

  override def nullSafeEval(v: Any): Any =
    ShingleMinMd5.compute(v.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ShingleMinMd5.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): ShingleMinMd5 =
    copy(child = newChild)
}

object ShingleMinMd5 {

  private val mdLocal: ThreadLocal[MessageDigest] =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
    }

  /** Input MUST be normalized text (single 0x20 separators — 0x20 never
    * occurs inside a UTF-8 multibyte sequence, so byte-level splitting
    * is UTF-8 safe). Documents shorter than `w` tokens yield one
    * partial shingle (the whole text), matching the Column/oracle
    * formulation. */
  def compute(nt: UTF8String, w: Int): Long = {
    val b = nt.getBytes
    val n = b.length
    var ntok = 1
    var i = 0
    while (i < n) { if (b(i) == ' ') ntok += 1; i += 1 }
    val tokStart = new Array[Int](ntok)
    val tokEnd = new Array[Int](ntok)
    var t = 0
    tokStart(0) = 0
    i = 0
    while (i < n) {
      if (b(i) == ' ') { tokEnd(t) = i; t += 1; tokStart(t) = i + 1 }
      i += 1
    }
    tokEnd(t) = n
    val nsh = math.max(ntok - (w - 1), 1)
    val md = mdLocal.get()
    var best = Long.MaxValue
    var s = 0
    while (s < nsh) {
      val from = tokStart(s)
      val until = tokEnd(math.min(s + w - 1, ntok - 1))
      md.reset()
      md.update(b, from, until - from)
      val d = md.digest()
      // value of the first 15 hex chars = unsigned BE of bytes 0..7, >>> 4
      var v = 0L
      var k = 0
      while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
      v = v >>> 4
      if (v < best) best = v
      s += 1
    }
    best
  }
}
