package graft.parser

/** Hand-written tokenizer for the PG-flavored dialect.
  *
  * Behavior mirrors the reference's `splitter` (reference
  * src/framequery/parser/_parser.py:578-592, util/_monadic.py:373-450):
  * `--` line comments stripped, keywords/operators lower-cased by the
  * parser (we preserve raw text + kind here), identifier case preserved,
  * `''`-escaped single-quoted strings, `""`-quoted identifiers, ints,
  * floats incl. scientific notation.
  */
object Tokenizer {
  sealed trait Kind
  case object TIdent extends Kind      // bare identifier or keyword
  case object TQuotedIdent extends Kind
  case object TString extends Kind     // value = unescaped content
  case object TInt extends Kind
  case object TFloat extends Kind
  case object TOp extends Kind

  final case class Token(kind: Kind, value: String, pos: Int) {
    /** lower-cased form used for keyword/operator matching */
    def lower: String = value.toLowerCase
  }

  // longest-match-first operator table (reference keeps the same list)
  private val operators = Seq(
    // longest-match-first: `!~*` before `!~` before `!=`; `~*` before `~`
    "!~*", "!~", "~*",
    "::", "||", "<<", ">>", "<=", ">=", "<>", "!=", "!>", "!<",
    "(", ")", "[", "]", ",", ".", "+", "-", "*", "/", "%", "^", "&", "|",
    "#", "~", "=", "<", ">", ";")

  def tokenize(sql: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql(i)
      if (c.isWhitespace) { i += 1 }
      else if (c == '-' && i + 1 < n && sql(i + 1) == '-') {
        while (i < n && sql(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && sql(i + 1) == '*') {
        // block comment, nested per the SQL standard (and PG)
        val start = i
        var depth = 1
        i += 2
        while (depth > 0) {
          if (i + 1 >= n)
            throw new ParseException(s"unterminated block comment at $start")
          if (sql(i) == '*' && sql(i + 1) == '/') { depth -= 1; i += 2 }
          else if (sql(i) == '/' && sql(i + 1) == '*') { depth += 1; i += 2 }
          else i += 1
        }
      } else if (c == '\'') {
        val sb = new StringBuilder
        val start = i
        i += 1
        var done = false
        while (!done) {
          if (i >= n) throw new ParseException(s"unterminated string literal at $start")
          if (sql(i) == '\'') {
            if (i + 1 < n && sql(i + 1) == '\'') { sb.append('\''); i += 2 }
            else { i += 1; done = true }
          } else { sb.append(sql(i)); i += 1 }
        }
        out += Token(TString, sb.toString, start)
      } else if (c == '"') {
        val sb = new StringBuilder
        val start = i
        i += 1
        var done = false
        while (!done) {
          if (i >= n) throw new ParseException(s"unterminated quoted identifier at $start")
          if (sql(i) == '"') {
            if (i + 1 < n && sql(i + 1) == '"') { sb.append('"'); i += 2 }
            else { i += 1; done = true }
          } else { sb.append(sql(i)); i += 1 }
        }
        out += Token(TQuotedIdent, sb.toString, start)
      } else if (c.isDigit || (c == '.' && i + 1 < n && sql(i + 1).isDigit)) {
        val start = i
        while (i < n && sql(i).isDigit) i += 1
        var isFloat = false
        if (i < n && sql(i) == '.') {
          // not a float if this is `1.` followed by an identifier (qualified
          // names never start with a digit, so `.` after digits = decimal)
          isFloat = true; i += 1
          while (i < n && sql(i).isDigit) i += 1
        }
        if (i < n && (sql(i) == 'e' || sql(i) == 'E')) {
          val save = i
          var j = i + 1
          if (j < n && (sql(j) == '+' || sql(j) == '-')) j += 1
          if (j < n && sql(j).isDigit) {
            isFloat = true
            i = j
            while (i < n && sql(i).isDigit) i += 1
          } else i = save
        }
        out += Token(if (isFloat) TFloat else TInt, sql.substring(start, i), start)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (sql(i).isLetterOrDigit || sql(i) == '_' || sql(i) == '$')) i += 1
        out += Token(TIdent, sql.substring(start, i), start)
      } else {
        operators.find(op => sql.startsWith(op, i)) match {
          case Some(op) =>
            out += Token(TOp, op, i)
            i += op.length
          case None =>
            throw new ParseException(s"unexpected character '$c' at position $i")
        }
      }
    }
    out.result()
  }
}

class ParseException(msg: String) extends RuntimeException(msg)
