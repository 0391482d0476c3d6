package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Mini search-query language → Catalyst `Column` predicates, ≅ the
  * reference's pyparsing grammar + AST rewrites + backend transpile
  * (Q1-Q3, /root/reference/mcrit/index/SearchQueryParser.py:83-179,
  * SearchQueryTree.py:10-200): quoted strings, `field:value`,
  * `field:<op>value` for < <= > >= = != ? !? (regex contains / not),
  * AND / OR / NOT / implicit AND, parentheses. Bare terms expand to an OR
  * of contains-conditions over the given default fields. NOT pushdown,
  * constant folding etc. are Catalyst's job once we emit Columns.
  */
object SearchQuery {

  sealed trait Node
  final case class And(xs: List[Node]) extends Node
  final case class Or(xs: List[Node]) extends Node
  final case class Not(x: Node) extends Node
  final case class Cond(field: String, op: String, value: String) extends Node
  final case class Term(value: String) extends Node

  // ---- parser (hand-rolled recursive descent) -------------------------

  final class ParseException(msg: String) extends Exception(msg)

  private final class P(s: String) {
    private var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def eof: Boolean = { ws(); i >= s.length }
    def peek: Char = s.charAt(i)
    /** keyword lookahead with a word-boundary check — `orange` is a bare
      * term, not the OR operator followed by `ange`; likewise `OR_bar` /
      * `AND2` (identifier chars continue the word, matching pyparsing's
      * Keyword semantics in the reference parser). */
    def peekKeyword(tok: String): Boolean = {
      ws()
      if (!s.regionMatches(true, i, tok, 0, tok.length)) return false
      val end = i + tok.length
      end >= s.length || {
        val c = s.charAt(end)
        !(c.isLetterOrDigit || c == '_')
      } || !tok.head.isLetter
    }
    def tryConsume(tok: String): Boolean = {
      if (peekKeyword(tok)) { i += tok.length; true } else false
    }

    def parseOr(): Node = {
      var xs = List(parseAnd())
      while (tryConsume("OR")) xs = parseAnd() :: xs
      if (xs.size == 1) xs.head else Or(xs.reverse)
    }

    def parseAnd(): Node = {
      var xs = List(parseNot())
      var go = true
      while (go) {
        ws()
        if (tryConsume("AND")) xs = parseNot() :: xs
        else if (!eof && peek != ')' && !peekKeyword("OR")) {
          // implicit AND
          xs = parseNot() :: xs
        } else go = false
      }
      if (xs.size == 1) xs.head else And(xs.reverse)
    }

    def parseNot(): Node =
      if (tryConsume("NOT")) Not(parseNot()) else parseAtom()

    def parseAtom(): Node = {
      ws()
      if (eof) throw new ParseException("unexpected end of query")
      if (peek == '(') {
        i += 1
        val n = parseOr()
        ws()
        if (eof || peek != ')') throw new ParseException("missing )")
        i += 1
        n
      } else if (peek == '"' || peek == '\'') {
        Term(quoted())
      } else {
        val tok = bare()
        val colon = tok.indexOf(':')
        if (colon > 0) {
          val field = tok.substring(0, colon)
          var rest = tok.substring(colon + 1)
          // quoted value directly after the colon: field:"multi word"
          // (bare() stops at the quote, so rest is empty here)
          val quotedAtColon = rest.isEmpty && !eof && (peek == '"' || peek == '\'')
          if (quotedAtColon) rest = quoted()
          // reference grammar: the operator is matched OUTSIDE the quote
          // (condition_compare = ":" + operator + search_term), so operator
          // characters INSIDE a quoted value are literal — f:"<=x" is
          // Cond(f, "=", "<=x"), not Cond(f, "<=", "x")
          var (op, v) =
            if (quotedAtColon) ("=", rest)
            else if (rest.startsWith("<=")) ("<=", rest.drop(2))
            else if (rest.startsWith(">=")) (">=", rest.drop(2))
            else if (rest.startsWith("!?")) ("!?", rest.drop(2))
            else if (rest.startsWith("!=")) ("!=", rest.drop(2))
            else if (rest.startsWith("<")) ("<", rest.drop(1))
            else if (rest.startsWith(">")) (">", rest.drop(1))
            else if (rest.startsWith("?")) ("?", rest.drop(1))
            else if (rest.startsWith("=")) ("=", rest.drop(1))
            else ("=", rest)
          // quoted value directly after an operator: field:>"a b" — and the
          // explicit '=' form field:="a b" (op = "=", v empty from the
          // drop). The plain-colon case field:"a b" already consumed its
          // quote above (quotedAtColon), so an empty quoted value there
          // must not re-consume a following quote as its own.
          if (v.isEmpty && !quotedAtColon && !eof && (peek == '"' || peek == '\'')) v = quoted()
          Cond(field, op, v)
        } else Term(tok)
      }
    }

    /** Double- OR single-quoted, with backslash escapes — matching the
      * reference's QuotedString('"'|"'", esc_char="\\"). */
    private def quoted(): String = {
      val q = s.charAt(i)
      i += 1 // opening quote
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != q) {
        if (s.charAt(i) == '\\' && i + 1 < s.length) { sb += s.charAt(i + 1); i += 2 }
        else { sb += s.charAt(i); i += 1 }
      }
      if (i >= s.length) throw new ParseException("unterminated quote")
      i += 1
      sb.toString
    }

    private def bare(): String = {
      ws()
      val sb = new StringBuilder
      // stop at quotes too: field:"v" must leave the quote for quoted()
      while (i < s.length && !s.charAt(i).isWhitespace && s.charAt(i) != '(' &&
          s.charAt(i) != ')' && s.charAt(i) != '"' && s.charAt(i) != '\'') {
        sb += s.charAt(i); i += 1
      }
      if (sb.isEmpty) throw new ParseException(s"unexpected char at $i")
      sb.toString
    }
  }

  // Driver-side LRU parse memo, ≅ the reference's lru_cache(100) on its
  // parser (/root/reference/mcrit/index/SearchQueryParser.py:172). ASTs are
  // immutable, so sharing a cached node is safe; access-ordered
  // LinkedHashMap gives true LRU eviction. Parse failures are not cached.
  private val memoCapacity = 100
  private val parseMemo =
    new java.util.LinkedHashMap[String, Node](memoCapacity * 2, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, Node]): Boolean =
        size() > memoCapacity
    }

  def parse(query: String): Node = {
    parseMemo.synchronized {
      val hit = parseMemo.get(query)
      if (hit != null) return hit
    }
    val p = new P(query)
    val n = p.parseOr()
    if (!p.eof) throw new ParseException("trailing input")
    parseMemo.synchronized { parseMemo.put(query, n) }
    n
  }

  // ---- transpile to Column --------------------------------------------

  /** Bare-term expansion spec: the term expands into this field's
    * contains-condition only when it has at least `minLen` chars — the
    * conditional-field rule of the reference's SearchFieldResolver
    * (≅ /root/reference/mcrit/index/SearchQueryTree.py:111-139, where sha256
    * participates only for terms of length ≥ 3).
    */
  final case class FieldSpec(name: String, minLen: Int = 0)

  /** Transpile options. `idField`: a bare all-digits term becomes a point
    * lookup on this column; `hexField`: a bare hex term of at least the given
    * length becomes an equality on this column (≅ the reference's id/sha
    * fast-path, /root/reference/mcrit/index/MinHashIndex.py:574-704).
    */
  final case class Options(
      fields: Seq[FieldSpec],
      numericFields: Set[String] = Set.empty,
      idField: Option[String] = None,
      hexField: Option[(String, Int)] = None)

  /** numericFields get int coercion (≅ MemorySearchTranspiler int coercion,
    * /root/reference/mcrit/storage/MemoryStorage.py:104-109).
    */
  def toColumn(node: Node, defaultFields: Seq[String],
      numericFields: Set[String] = Set.empty): Column =
    toColumnWith(node, Options(defaultFields.map(FieldSpec(_)), numericFields))

  def toColumnWith(node: Node, o: Options): Column = node match {
    case And(xs) => xs.map(toColumnWith(_, o)).reduce(_ && _)
    case Or(xs) => xs.map(toColumnWith(_, o)).reduce(_ || _)
    case Not(x) => !toColumnWith(x, o)
    case Term(v) =>
      lazy val isInt = v.nonEmpty && v.forall(_.isDigit) && v.toLongOption.isDefined
      lazy val isHex = o.hexField.exists { case (_, n) =>
        v.length >= n && v.forall(c => c.isDigit || ('a' <= (c | 0x20) && (c | 0x20) <= 'f'))
      }
      if (o.idField.isDefined && isInt) col(o.idField.get) === v.toLong
      else if (isHex) lower(col(o.hexField.get._1)) === v.toLowerCase
      else {
        // bare term → OR of contains over the applicable fields
        // (≅ SearchFieldResolver; too-short terms skip conditional fields)
        val applicable = o.fields.filter(f => v.length >= f.minLen)
        if (applicable.isEmpty) lit(false)
        else applicable.map(f => col(f.name).cast("string").contains(v)).reduce(_ || _)
      }
    case Cond(field, op, v) =>
      val c = col(field)
      val value: Any =
        if (o.numericFields.contains(field)) v.toLongOption.getOrElse(v) else v
      op match {
        case "=" => c === value
        case "!=" => c =!= value
        case "<" => c < value
        case "<=" => c <= value
        case ">" => c > value
        case ">=" => c >= value
        case "?" => c.cast("string").rlike(v)
        case "!?" => !c.cast("string").rlike(v)
      }
  }

  def predicate(query: String, defaultFields: Seq[String],
      numericFields: Set[String] = Set.empty): Column =
    toColumn(parse(query), defaultFields, numericFields)

  def predicateWith(query: String, o: Options): Column =
    toColumnWith(parse(query), o)
}
