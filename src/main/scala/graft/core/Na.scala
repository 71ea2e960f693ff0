package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's cross-cutting NA vocabulary (SURVEY.md §1.2).
  *
  * Reference behavior: strings in {"", "na", "n/a", "nan", "none", "null",
  * "nah"} (case-insensitive, after trim) are treated as missing everywhere —
  * row filters, header drops, value coercion.
  * See /root/reference/247/tools/read_file_tool.py:175,
  * /root/reference/Flips/tools/baby_flip_tool.py:33-41.
  */
object Na {
  val vocabulary: Seq[String] = Seq("", "na", "n/a", "nan", "none", "null", "nah")

  /** True when the (string) column is NA-like. Null-safe: null => true. */
  def isNa(c: Column): Column =
    c.isNull || lower(trim(c)).isin(vocabulary: _*)

  /** F1: NA vocabulary -> null, everything else passes through trimmed. */
  def naNormalize(c: Column): Column =
    when(isNa(c), lit(null)).otherwise(trim(c))

  /** Driver-side variant for header/grid logic. */
  def isNaString(s: String): Boolean =
    s == null || vocabulary.contains(s.trim.toLowerCase)
}
