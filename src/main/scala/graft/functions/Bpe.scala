package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared greedy-BPE encode kernel (Sennrich, Haddow & Birch, "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016 —
  * the byte-pair-encoding subword tokenizer every modern LLM pipeline
  * counts tokens with; Gage 1994 for the original pair-compression).
  *
  * ENCODING CONTRACT (both engines run the IDENTICAL algorithm): a word
  * is represented as its code points joined and wrapped by the
  * unit-separator `\u001f` (`·u·n·i·t·`); merges apply IN RANK ORDER,
  * each as a leftmost-non-overlapping string `replace` of
  * `·a·b· → ·ab·` repeated until fixpoint. The repeat handles the
  * back-to-back case (`a b a b` — the first replace consumes the shared
  * boundary separator and misses the second pair), and rank order is
  * sufficient because merging (a,b) can only CREATE pairs involving the
  * new symbol ab, which only later-rank merges reference. The DuckDB
  * twin replays exactly this: a recursive CTE whose step is the same
  * `replace`/rank-advance on the same separator representation, so
  * subword splits compare byte-for-byte across engines.
  *
  * Per-word results are memoized (bounded at 64 Ki entries — vocabulary
  * is Zipfian, so the cache hits almost always; past the cap the kernel
  * just recomputes, it never grows unboundedly on a 100 TB corpus).
  * A word is only run against merge r if the raw word CONTAINS a·b's
  * concatenation — a necessary condition (symbols are in-order
  * substrings of the word), so the common case is one substring probe
  * per merge, not a replace loop.
  */
final class BpeTable(as: Array[String], bs: Array[String]) extends Serializable {
  import BpeTable.Sep

  private val pats = Array.tabulate(as.length)(i => s"$Sep${as(i)}$Sep${bs(i)}$Sep")
  private val reps = Array.tabulate(as.length)(i => s"$Sep${as(i)}${bs(i)}$Sep")
  private val raws = Array.tabulate(as.length)(i => as(i) + bs(i))

  @transient private lazy val cache = new ConcurrentHashMap[String, (String, Int)]()
  private val cacheCap = 1 << 16

  /** Sep-wrap a word: one separator before every code point and one
    * trailing — `unit` → `·u·n·i·t·`. */
  private def wrap(w: String): String = {
    val sb = new java.lang.StringBuilder(w.length * 2 + 1)
    sb.append(Sep)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      sb.appendCodePoint(cp).append(Sep)
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** Encode one word: (display form — pieces joined by `"@@ "` — and
    * piece count). */
  def encodeWord(w: String): (String, Int) = {
    val hit = cache.get(w)
    if (hit != null) return hit
    var s = wrap(w)
    var r = 0
    while (r < pats.length) {
      if (w.contains(raws(r))) {
        var t = s.replace(pats(r), reps(r))
        while (!(t eq s) && t != s) { s = t; t = s.replace(pats(r), reps(r)) }
      }
      r += 1
    }
    val pieces = s.split(Sep).filter(_.nonEmpty)
    val out = (pieces.mkString("@@ "), pieces.length)
    if (cache.size < cacheCap) cache.put(w, out)
    out
  }

  /** Encode a whole document's token array → (total subword count,
    * per-word displays joined by single spaces). Called from generated
    * code — keep the signature Java-plain. */
  def encodeDoc(toks: ArrayData): InternalRow = {
    var n = 0L
    val sb = new java.lang.StringBuilder
    var i = 0
    val len = toks.numElements()
    while (i < len) {
      val (disp, cnt) = encodeWord(toks.getUTF8String(i).toString)
      if (i > 0) sb.append(' ')
      sb.append(disp)
      n += cnt
      i += 1
    }
    new GenericInternalRow(Array[Any](n, UTF8String.fromString(sb.toString)))
  }
}

object BpeTable {
  /** Symbol separator for the wrapped representation — the ASCII unit
    * separator, which cannot appear inside a whitespace-split token of
    * the corpora this engine reads (and the twin uses `chr(31)`). */
  val Sep = "\u001f"

  def fromLiterals(a: Any, b: Any): BpeTable = {
    def strs(x: Any): Array[String] = {
      val ad = x.asInstanceOf[ArrayData]
      Array.tabulate(ad.numElements())(i => ad.getUTF8String(i).toString)
    }
    new BpeTable(strs(a), strs(b))
  }
}

/** `graft_bpe_encode(tokens, merge_a, merge_b)` — greedy BPE encode of a
  * document's token array against a literal merge table, returning
  * `struct<n_bpe: bigint, bpe_text: string>` in ONE pass inside
  * whole-stage codegen (the kernel call compiles into the generated
  * consume, no UDF/serde boundary). The merge arrays must be foldable:
  * the table (and its memo cache) is built once per plan and shipped to
  * every task as a codegen reference object. */
case class BpeEncodeDoc(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def prettyName: String = "graft_bpe_encode"

  override def dataType: DataType = StructType(Seq(
    StructField("n_bpe", LongType, nullable = false),
    StructField("bpe_text", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _), ArrayType(StringType, _)) =>
        if (!second.foldable || !third.foldable)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires literal merge arrays")
        else {
          // validate the foldable merge arrays HERE, so SQL-surface misuse
          // is a clean analysis-time error (round-12 ADVICE): a null array
          // would NPE in fromLiterals, unequal lengths would either throw
          // ArrayIndexOutOfBounds (shorter merge_b) or silently drop
          // trailing merges (longer merge_b), and a null ELEMENT would NPE
          // mid-encode on an executor.
          val (a, b) = (second.eval(), third.eval())
          if (a == null || b == null)
            TypeCheckResult.TypeCheckFailure(
              s"$prettyName merge arrays must be non-null literals")
          else {
            val (ad, bd) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
            if (ad.numElements() != bd.numElements())
              TypeCheckResult.TypeCheckFailure(
                s"$prettyName merge arrays must have equal length, " +
                  s"got ${ad.numElements()} vs ${bd.numElements()}")
            else if ((0 until ad.numElements()).exists(i =>
                ad.isNullAt(i) || bd.isNullAt(i)))
              TypeCheckResult.TypeCheckFailure(
                s"$prettyName merge arrays must not contain null entries")
            else TypeCheckResult.TypeCheckSuccess
          }
        }
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<string>, array<string>), " +
          s"got (${a.sql}, ${b.sql}, ${c.sql})")
    }

  @transient private lazy val table: BpeTable =
    BpeTable.fromLiterals(second.eval(), third.eval())

  override def nullSafeEval(t: Any, a: Any, b: Any): Any =
    table.encodeDoc(t.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, (t, _, _) => s"${ev.value} = $ref.encodeDoc($t);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): BpeEncodeDoc =
    copy(first = newFirst, second = newSecond, third = newThird)
}
