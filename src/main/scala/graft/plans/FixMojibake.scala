package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair — undo ONE level of the classic web-corpus
  * corruption where UTF-8 bytes were decoded as Windows-1252 ("Ã©"
  * instead of "é", "â€™" instead of "’"). The ftfy move, as a scalar
  * expression: map each char back to its sloppy-cp1252 byte (the 27
  * defined 0x80-0x9F specials, Latin-1 pass-through elsewhere,
  * C1-control pass-through for the five undefined code positions —
  * "sloppy" because real-world decoders emit those controls), and
  * wherever a maximal char run re-encodes to a STRICTLY VALID UTF-8
  * multi-byte sequence (lead C2-F4, continuation ranges enforced per
  * lead — no overlongs, no surrogates, no > U+10FFFF), emit the
  * decoded code point instead. Chars that don't participate pass
  * through untouched, so plain ASCII, healthy accents and CJK are
  * no-ops.
  *
  * The law MojibakeSpec pins: for EVERY string s,
  * `repair(cp1252Decode(utf8Bytes(s))) == s` — corruption is total
  * (sloppy cp1252 maps all 256 bytes) and byte-bijective, and a real
  * string's UTF-8 bytes always pass the strict validator, so repair
  * inverts exactly one encode/decode round trip. Pre-existing
  * mojibake inside s is itself double-encoded by the corruption and
  * comes back after one repair (repair once per suspected level —
  * the expression is deliberately single-level, like `ftfy`'s fixer
  * steps). False positives are possible on text that GENUINELY spells
  * a valid sequence ("Ã©" meant literally) — inherent to the problem;
  * gate on a fix-count column if the corpus is known-clean.
  *
  * Map-side scalar work at 100 TB: pure scan parallelism, no regex,
  * no shared state.
  */
case class FixMojibake(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fix_mojibake requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "fix_mojibake"

  override def nullSafeEval(input: Any): Any =
    FixMojibake.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.FixMojibake.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): FixMojibake =
    copy(child = newChild)
}

object FixMojibake {

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    // fast path: any char that could START a repairable sequence maps
    // to a byte ≥ 0xC2, i.e. the char is in [0xC2,0xFF] (Latin-1 run —
    // no 0x80-0x9F special maps above 0xC1)
    var any = false
    var j = 0
    while (!any && j < n) {
      val c = str.charAt(j)
      if (c >= 0xC2 && c <= 0xFF) any = true
      j += 1
    }
    if (!any) return s
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      val b0 = cpToByte(c)
      var consumed = 0
      if (b0 >= 0xC2 && b0 <= 0xF4) {
        if (b0 <= 0xDF) { // 2-byte sequence
          if (i + 1 < n) {
            val b1 = cpToByte(str.charAt(i + 1))
            if (b1 >= 0x80 && b1 <= 0xBF) {
              sb.appendCodePoint(((b0 & 0x1F) << 6) | (b1 & 0x3F))
              consumed = 2
            }
          }
        } else if (b0 <= 0xEF) { // 3-byte; E0 bans overlong, ED bans surrogates
          if (i + 2 < n) {
            val b1 = cpToByte(str.charAt(i + 1))
            val b2 = cpToByte(str.charAt(i + 2))
            val lo1 = if (b0 == 0xE0) 0xA0 else 0x80
            val hi1 = if (b0 == 0xED) 0x9F else 0xBF
            if (b1 >= lo1 && b1 <= hi1 && b2 >= 0x80 && b2 <= 0xBF) {
              sb.appendCodePoint(
                ((b0 & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F))
              consumed = 3
            }
          }
        } else { // 4-byte; F0 bans overlong, F4 caps at U+10FFFF
          if (i + 3 < n) {
            val b1 = cpToByte(str.charAt(i + 1))
            val b2 = cpToByte(str.charAt(i + 2))
            val b3 = cpToByte(str.charAt(i + 3))
            val lo1 = if (b0 == 0xF0) 0x90 else 0x80
            val hi1 = if (b0 == 0xF4) 0x8F else 0xBF
            if (b1 >= lo1 && b1 <= hi1 && b2 >= 0x80 && b2 <= 0xBF &&
                b3 >= 0x80 && b3 <= 0xBF) {
              sb.appendCodePoint(((b0 & 0x07) << 18) | ((b1 & 0x3F) << 12) |
                ((b2 & 0x3F) << 6) | (b3 & 0x3F))
              consumed = 4
            }
          }
        }
      }
      if (consumed == 0) { sb.append(c); i += 1 } else i += consumed
    }
    UTF8String.fromString(sb.toString)
  }

  /** Char → its sloppy-windows-1252 byte, or -1 if the char is not in
    * the cp1252 image (then it can never participate in a repair).
    */
  def cpToByte(c: Char): Int = {
    if (c < 0x80) c.toInt                  // ASCII
    else if (c >= 0xA0 && c <= 0xFF) c.toInt // Latin-1 pass-through
    else if (c >= 0x80 && c <= 0x9F) c.toInt // sloppy: C1 controls as-is
    else c match {                          // the 27 cp1252 specials
      case '€' => 0x80; case '‚' => 0x82; case 'ƒ' => 0x83
      case '„' => 0x84; case '…' => 0x85; case '†' => 0x86
      case '‡' => 0x87; case 'ˆ' => 0x88; case '‰' => 0x89
      case 'Š' => 0x8A; case '‹' => 0x8B; case 'Œ' => 0x8C
      case 'Ž' => 0x8E; case '‘' => 0x91; case '’' => 0x92
      case '“' => 0x93; case '”' => 0x94; case '•' => 0x95
      case '–' => 0x96; case '—' => 0x97; case '˜' => 0x98
      case '™' => 0x99; case 'š' => 0x9A; case '›' => 0x9B
      case 'œ' => 0x9C; case 'ž' => 0x9E; case 'Ÿ' => 0x9F
      case _ => -1
    }
  }

  /** Byte (0-255) → the char sloppy-cp1252 decodes it to — the test
    * harness's corruption oracle (inverse of [[cpToByte]] on all 256
    * byte values).
    */
  def byteToCp(b: Int): Char = b match {
    case 0x80 => '€'; case 0x82 => '‚'; case 0x83 => 'ƒ'
    case 0x84 => '„'; case 0x85 => '…'; case 0x86 => '†'
    case 0x87 => '‡'; case 0x88 => 'ˆ'; case 0x89 => '‰'
    case 0x8A => 'Š'; case 0x8B => '‹'; case 0x8C => 'Œ'
    case 0x8E => 'Ž'; case 0x91 => '‘'; case 0x92 => '’'
    case 0x93 => '“'; case 0x94 => '”'; case 0x95 => '•'
    case 0x96 => '–'; case 0x97 => '—'; case 0x98 => '˜'
    case 0x99 => '™'; case 0x9A => 'š'; case 0x9B => '›'
    case 0x9C => 'œ'; case 0x9E => 'ž'; case 0x9F => 'Ÿ'
    case other => other.toChar
  }

  def of(text: Column): Column =
    GraftColumnShim.column(FixMojibake(GraftColumnShim.expression(text)))
}
