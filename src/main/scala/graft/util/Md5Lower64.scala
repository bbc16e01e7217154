package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** The engine-portable 64-bit hash: the LOWER 64 bits of md5, assembled
  * little-endian to equal DuckDB's `md5_number_lower` bit-for-bit, then
  * masked to the non-negative 63-bit range (so BIGINT ordering matches
  * unsigned ordering in both engines).
  *
  * Assembly: the md5 hex digits 17..32 are the last 8 digest bytes;
  * little-endian means reversing the BYTE order (pairs of hex digits).
  * `reverse` of the 16-char suffix reverses bytes AND swaps the two
  * nibbles inside each byte; one `regexp_replace((.)(.) -> $2$1)` swaps
  * them back. A single `conv` then parses the 16 reordered digits as
  * one unsigned 64-bit number (conv returns it as a decimal string, so
  * the mask is `% 2^63` in decimal(20,0) space).
  *
  * The input column is referenced exactly ONCE — this is load-bearing
  * for PERFORMANCE, not just style: the previous 8-substring concat
  * referenced `col` eight times, and when Catalyst pushes a predicate
  * through the projection that computed `col` (`PushPredicateThroughNonJoin`
  * substitutes aliases with no cost check) the md5 child was inlined
  * into every reference — FilterExec has no subexpression elimination,
  * so md5 ran 8x per row in any pushed filter (16x when two derived
  * positions were tested, measured at 12 s for one 600k-row pass in
  * r10's sketch_bloom_join forensics). Same value on every input
  * (QualitySpec/PipelineOpsSpec parity + fuzz tests).
  */
object Md5Lower64 {

  /** The 16 low-64 hex digits of `col` reordered to little-endian byte
    * order — `col` referenced exactly once (see object scaladoc). */
  private def le(col: String): String =
    s"regexp_replace(reverse(substring($col, 17, 16)), '(.)(.)', '$$2$$1')"

  /** SQL fragment computing the masked hash from a hex-md5 column named
    * `col` (as produced by Spark's `md5(...)`) — kept as the documented
    * pure-SQL twin of the native kernel [[of]] executes (KernelSpec
    * pins their equality), and for contexts that need a SQL string. */
  def sql(col: String): String =
    s"cast(cast(conv(${le(col)}, 16, 10) as decimal(20, 0))" +
      " % 9223372036854775808 as bigint)"

  /** Column form: the native codegen'd nibble-parse kernel
    * ([[graft.functions.HexLower64]]) — same value as [[sql]] at ~50 ns
    * per row instead of ~3 µs (no conv/regexp/decimal churn). */
  def of(col: String): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.HexLower64(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          .quotedString(col),
        signed = false))

  /** Full SIGNED 64-bit variant (bit 63 becomes the sign, exactly as
    * the little-endian byte fold produced): low63 - bit63 * 2^63. Used
    * where every bit carries information (the SimHash bit votes). */
  def signedSql(col: String): String = {
    val u = s"cast(conv(${le(col)}, 16, 10) as decimal(20, 0))"
    s"(cast($u % 9223372036854775808 as bigint)" +
      s" + cast($u div 9223372036854775808 as bigint)" +
      " * -9223372036854775808)"
  }

  /** Column form of [[signedSql]] via the native kernel. */
  def signedOf(col: String): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.HexLower64(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          .quotedString(col),
        signed = true))
}
