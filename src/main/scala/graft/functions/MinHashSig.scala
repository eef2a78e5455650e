package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signature: for each hash index i in 0..k-1,
  * `min(md5("<i>|" + shingle))` over the shingle array, emitted as k
  * lowercase-hex strings — semantically identical to the k-fold
  * `array_min(transform(sh, s -> md5('i|' || s)))` chain (and to the
  * DuckDB `list_min(list_transform(...))` oracle) but one tight loop
  * per row with a reused digest instance instead of k interpreted
  * higher-order passes (~an order of magnitude faster on the dedup hot
  * path; SURVEY §4.3 tier-b custom expression).
  *
  * Codegen: a static-call `doGenCode` (not CodegenFallback) — a
  * fallback expression disqualifies its whole operator from whole-stage
  * codegen (`CollapseCodegenStages.supportCodegen`), so the signature
  * projection would run row-at-a-time interpreted; the generated call
  * keeps the stage fused.
  *
  * Minimum selection compares raw 16-byte digests unsigned-lex, which
  * orders exactly like the lowercase hex rendering.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType)
  override def nullIntolerant: Boolean = true
  // Eval returns null for an EMPTY (non-null) shingle array, so the
  // output is nullable even over a non-nullable child. Without this
  // override, nullSafeCodeGen's non-nullable branch never declares
  // ev.isNull and the `${ev.isNull} = true;` assignment is a Janino
  // compile error — whole-stage codegen silently falls back to
  // interpreted eval (and UnsafeProjection can NPE on the null).
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(v: Any): Any =
    NativeTextEval.minhashSig(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.NativeTextEval.minhashSig($c, $k);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** Band keys straight from the shingles in one pass:
  * `"<b>|" + md5(hex(sig[b·rows]) + "|" + … + hex(sig[b·rows+rows-1]))`
  * for each of `bands` bands of `rows = k/bands` signature rows —
  * identical to hashing the hex signature items with concat_ws("|"), but
  * without materializing the signature column (which an explode-generator
  * would otherwise inline and recompute once per band-key reference).
  * Codegen'd via static call (see [[MinHashSig]]).
  */
case class MinHashBands(child: Expression, k: Int, bands: Int)
    extends UnaryExpression {
  require(bands >= 1 && k >= bands && k % bands == 0,
    s"bands ($bands) must divide k ($k) — a remainder silently drops " +
      "signature rows, and bands > k degenerates every key to a constant")

  override def dataType: DataType = ArrayType(StringType)
  override def nullIntolerant: Boolean = true
  // Null for empty shingle arrays regardless of child nullability —
  // see the MinHashSig.nullable note.
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(v: Any): Any =
    NativeTextEval.minhashBands(v.asInstanceOf[ArrayData], k, bands)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} =
      |  graft.functions.NativeTextEval.minhashBands($c, $k, $bands);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): MinHashBands =
    copy(child = c)
}

/** Single-pass SimHash bits: ONE md5 per feature for d <= 32 (all `d`
  * nibble votes extracted from that digest — bit j votes +1 iff hex
  * digit j of md5(feature) is in 8..f), a second SALTED digest
  * md5("1|" + feature) for bits 33..64 (block 0 stays unsalted so d <=
  * 32 fingerprints are unchanged). Semantically identical to the d-fold
  * `aggregate(features, …substring(md5(t), j, 1)…)` chain and to the SQL
  * oracle, but without re-hashing every feature d times. Codegen'd via
  * static call (see [[MinHashSig]]).
  */
case class SimHashBits(child: Expression, d: Int)
    extends UnaryExpression {
  require(d >= 1 && d <= 64,
    "d must be in 1..64 (two md5 digests of 32 hex digits)")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_bits"

  override def nullSafeEval(v: Any): Any =
    NativeTextEval.simhashBits(v.asInstanceOf[ArrayData], d)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NativeTextEval.simhashBits($c, $d)")

  override protected def withNewChildInternal(c: Expression): SimHashBits =
    copy(child = c)
}

object SimHashBits {
  /** Column API over an array<string> feature column. */
  def apply(features: Column, d: Int): Column =
    GraftBridge.column(SimHashBits(GraftBridge.expression(features), d))
}

/** Shared evaluators for the native text expressions — one
  * implementation serving both the interpreted path (`nullSafeEval`)
  * and the generated code (static-forwarder calls from Janino-compiled
  * Java, which is why this object must stay top-level with no companion
  * class).
  */
object NativeTextEval {

  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Per hash index i: the 16-byte digest min over `md5("<i>|"+shingle)`.
    * Unsigned-lex byte order == lowercase-hex string order.
    */
  private def minDigests(arr: ArrayData, k: Int): Array[Array[Byte]] = {
    val n = arr.numElements()
    if (n == 0) return null
    val prefixes = Array.tabulate(k)(i => s"$i|".getBytes("UTF-8"))
    val md = MessageDigest.getInstance("MD5")
    val mins = new Array[Array[Byte]](k)
    var s = 0
    while (s < n) {
      if (!arr.isNullAt(s)) {
        val bytes = arr.getUTF8String(s).getBytes
        var i = 0
        while (i < k) {
          md.reset()
          md.update(prefixes(i))
          md.update(bytes)
          val d = md.digest()
          if (mins(i) == null || lessThan(d, mins(i))) mins(i) = d
          i += 1
        }
      }
      s += 1
    }
    mins
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  def hex(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** null for an EMPTY shingle array (mirrors the HOF chain's null). */
  def minhashSig(arr: ArrayData, k: Int): ArrayData = {
    val mins = minDigests(arr, k)
    if (mins == null) return null
    new GenericArrayData(mins.map { d =>
      if (d == null) null
      else UTF8String.fromString(hex(d))
    }.asInstanceOf[Array[Any]])
  }

  /** null for an EMPTY shingle array; an all-null input array leaves the
    * min digests null — null band keys, not an NPE.
    */
  def minhashBands(arr: ArrayData, k: Int, bands: Int): ArrayData = {
    val mins = minDigests(arr, k)
    if (mins == null) return null
    val rows = k / bands
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      if ((0 until rows).exists(r => mins(b * rows + r) == null)) {
        out(b) = null
      } else {
        val joined = (0 until rows)
          .map(r => hex(mins(b * rows + r)))
          .mkString("|")
        md.reset()
        val d = md.digest(joined.getBytes("UTF-8"))
        out(b) = UTF8String.fromString(s"$b|" + hex(d))
      }
      b += 1
    }
    new GenericArrayData(out)
  }

  def simhashBits(arr: ArrayData, d: Int): UTF8String = {
    val n = arr.numElements()
    val votes = new Array[Int](d)
    val md = MessageDigest.getInstance("MD5")
    val salt = "1|".getBytes
    var s = 0
    while (s < n) {
      if (!arr.isNullAt(s)) {
        val bytes = arr.getUTF8String(s).getBytes
        md.reset()
        val digest = md.digest(bytes)
        var j = 0
        val lim = math.min(d, 32)
        while (j < lim) {
          val nibble =
            if (j % 2 == 0) (digest(j / 2) >> 4) & 0xf
            else digest(j / 2) & 0xf
          votes(j) += (if (nibble >= 8) 1 else -1)
          j += 1
        }
        if (d > 32) {
          md.reset()
          md.update(salt)
          val digest1 = md.digest(bytes)
          while (j < d) {
            val k = j - 32
            val nibble =
              if (k % 2 == 0) (digest1(k / 2) >> 4) & 0xf
              else digest1(k / 2) & 0xf
            votes(j) += (if (nibble >= 8) 1 else -1)
            j += 1
          }
        }
      }
      s += 1
    }
    val out = new Array[Char](d)
    var j = 0
    while (j < d) {
      out(j) = if (votes(j) >= 0) '1' else '0'
      j += 1
    }
    UTF8String.fromString(new String(out))
  }

  def ngrams(arr: ArrayData, maxGram: Int, minChars: Int): ArrayData = {
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val sep = UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var g = 1
    while (g <= maxGram) {
      var start = 0
      while (start + g <= n) {
        val window = java.util.Arrays.copyOfRange(toks, start, start + g)
        val gram = UTF8String.concatWs(sep, window: _*)
        if (gram != null && gram.numChars() >= minChars) seen.add(gram)
        start += 1
      }
      g += 1
    }
    val out = new Array[Any](seen.size)
    var k = 0
    val it = seen.iterator()
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Whitespace tokens of a UTF-8 string — see [[TokensExpr]] for the
    * exact-equivalence contract. Byte-level scan: the six Java-`\s`
    * ASCII bytes never appear inside multi-byte UTF-8 sequences.
    */
  def wsTokens(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < n) {
      // skip whitespace run
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start)
        out.add(UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, start, i)))
    }
    new GenericArrayData(out.toArray)
  }

  /** Count of array elements present in `set` (nulls don't count). */
  def stopHits(arr: ArrayData,
               set: java.util.HashSet[UTF8String]): Long = {
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c ||
      b == 0x0d

  def wordShingles(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val sep = UTF8String.fromString(" ")
    if (len >= n) {
      val out = new Array[Any](len - n + 1)
      var s = 0
      while (s + n <= len) {
        out(s) = UTF8String.concatWs(sep,
          java.util.Arrays.copyOfRange(toks, s, s + n): _*)
        s += 1
      }
      new GenericArrayData(out)
    } else {
      new GenericArrayData(
        Array[Any](UTF8String.concatWs(sep, toks: _*)))
    }
  }
}

object MinHashSig {
  /** Column API over a prepared array<string> shingles column. */
  def apply(shingles: Column, k: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(shingles), k))
}

object MinHashBands {
  /** Column API: band keys from shingles in one pass. */
  def apply(shingles: Column, k: Int, bands: Int): Column =
    GraftBridge.column(
      MinHashBands(GraftBridge.expression(shingles), k, bands))
}
