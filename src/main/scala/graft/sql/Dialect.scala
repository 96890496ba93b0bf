package graft.sql

/** Tiny SQL pre-pass bridging the reference's PostgreSQL-flavored dialect
  * (reference: vinum/parser/parser.py pglast grammar) to Spark SQL.
  *
  * Rewrites, applied only OUTSIDE string literals / quoted identifiers:
  *   - `np.name`  -> `np_name`   (the NumPy function namespace,
  *     reference: vinum/core/udf.py:48-55; resolved by [[graft.functions.Registry]])
  *   - `#`        -> `^`         (pg bitwise xor, reference:
  *     vinum/core/expressions.py:17; Spark spells xor `^`)
  *
  * Everything else (operators, precedence, aggregate/HAVING/ORDER BY/LIMIT
  * semantics) is already shared between the two dialects and is left to
  * Spark's ANTLR parser.
  */
object Dialect {

  /** Apply all dialect rewrites. Quote-aware single pass. */
  def rewrite(sql: String): String = {
    val out = new StringBuilder(sql.length + 8)
    var i = 0
    val n = sql.length
    var inSingle = false // '...' string literal ('' escapes)
    var inDouble = false // "..." quoted identifier
    var inBack = false   // `...` quoted identifier (Spark)
    while (i < n) {
      val c = sql.charAt(i)
      if (inSingle) {
        out.append(c); if (c == '\'') inSingle = false; i += 1
      } else if (inDouble) {
        out.append(c); if (c == '"') inDouble = false; i += 1
      } else if (inBack) {
        out.append(c); if (c == '`') inBack = false; i += 1
      } else c match {
        case '\'' => inSingle = true; out.append(c); i += 1
        case '"'  => inDouble = true; out.append(c); i += 1
        case '`'  => inBack = true; out.append(c); i += 1
        case '#'  => out.append('^'); i += 1
        case 'n' | 'N'
            if i + 2 < n &&
              (sql.charAt(i + 1) == 'p' || sql.charAt(i + 1) == 'P') &&
              sql.charAt(i + 2) == '.' &&
              (i == 0 || !isIdentChar(sql.charAt(i - 1))) &&
              i + 3 < n && isIdentStart(sql.charAt(i + 3)) =>
          out.append(c).append(sql.charAt(i + 1)).append('_'); i += 3
        case _ => out.append(c); i += 1
      }
    }
    out.toString
  }

  /** First table identifier after FROM, outside quotes — the name the
    * receiver table is bound to (the reference binds the receiver
    * regardless of the FROM name, vinum/api/table.py:219-220).
    */
  def firstFromTable(sql: String): Option[String] = {
    val m = FromRe.findFirstMatchIn(stripLiterals(sql))
    m.map(_.group(1))
  }

  private val FromRe =
    """(?i)\bfrom\s+([A-Za-z_][A-Za-z0-9_]*)""".r

  private def stripLiterals(sql: String): String = {
    val out = new StringBuilder(sql.length)
    var inSingle = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inSingle) { if (c == '\'') inSingle = false; out.append(' ') }
      else if (c == '\'') { inSingle = true; out.append(' ') }
      else out.append(c)
      i += 1
    }
    out.toString
  }

  private def isIdentStart(c: Char): Boolean =
    Character.isLetter(c) || c == '_'
  private def isIdentChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_' || c == '.'
}
