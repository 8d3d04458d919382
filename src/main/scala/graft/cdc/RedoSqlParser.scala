package graft.cdc

import scala.collection.mutable

/**
 * Parser for Oracle-LogMiner-style redo DML statements.
 *
 * LogMiner (with STRING_LITERALS_IN_STMT / NO_SQL_DELIMITER / NO_ROWID_IN_STMT, cf. reference
 * OracleConnectorSQL2.java:8-9) emits literal-only INSERT / UPDATE / DELETE statements:
 *
 *   insert into "HR"."EMP"("ID","NAME") values (1,'O''Brien')
 *   update "HR"."EMP" set "SAL" = 2600.5 where "ID" = 1 and "BONUS" IS NULL
 *   delete from "HR"."EMP" where "ID" = 1
 *
 * The reference parses these with JSqlParser (OracleSourceConnectorUtils2.java:256-358); we
 * implement a small hand-rolled tokenizer + recursive-descent parser for exactly this grammar.
 * Semantics mirrored from the reference:
 *   - INSERT  -> data  = zip(columns, values);       before = empty   (Utils:274-296)
 *   - UPDATE  -> before = WHERE equality conjuncts;  data = before overlaid with SET (Utils:297-333,389-399)
 *   - DELETE  -> before = WHERE conjuncts;           data = empty     (Utils:335-352)
 *   - `IS NULL` treated as `= NULL` (Utils:268 pre-rewrite); literal NULL -> null value (Utils:392,397,405)
 *   - literal cleaning: strip `TIMESTAMP `/`DATE ` prefix, one layer of quotes, unescape
 *     doubled single-quotes (opt-in in the reference via map.unescaped.strings, Utils:286-292;
 *     we default to unescaping = true) (Utils:467-472)
 */
object RedoSqlParser {

  /** Ordered column->literal maps; value None == SQL NULL. */
  final case class ParsedDml(
      operation: String,
      owner: String,
      table: String,
      data: Vector[(String, Option[String])],
      before: Vector[(String, Option[String])]) {
    def dataMap: Map[String, String]   = data.collect { case (k, Some(v)) => k -> v }.toMap
    def beforeMap: Map[String, String] = before.collect { case (k, Some(v)) => k -> v }.toMap
  }

  // ---------------------------------------------------------------- tokenizer

  sealed trait Tok
  final case class Ident(name: String)  extends Tok // bare or "quoted" identifier
  final case class Str(value: String)   extends Tok // 'literal' with '' unescaped to '
  final case class Num(text: String)    extends Tok
  final case class Sym(ch: Char)        extends Tok // ( ) , = . ;
  case object NullTok                   extends Tok

  private def isIdentStart(c: Char) = c.isLetter || c == '_'
  private def isIdentPart(c: Char)  = c.isLetterOrDigit || c == '_' || c == '$' || c == '#'

  /** Tokenize; keywords are returned as Ident with original case preserved. */
  def tokenize(sql: String, unescape: Boolean = true): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '"') { // quoted identifier; "" escapes a quote
        val sb = new mutable.StringBuilder
        i += 1
        var done = false
        while (!done && i < n) {
          val ch = sql.charAt(i)
          if (ch == '"') {
            if (i + 1 < n && sql.charAt(i + 1) == '"') { sb += '"'; i += 2 }
            else { done = true; i += 1 }
          } else { sb += ch; i += 1 }
        }
        out += Ident(sb.result())
      } else if (c == '\'') { // string literal; '' escapes a quote
        val sb = new mutable.StringBuilder
        i += 1
        var done = false
        while (!done && i < n) {
          val ch = sql.charAt(i)
          if (ch == '\'') {
            if (i + 1 < n && sql.charAt(i + 1) == '\'') {
              sb ++= (if (unescape) "'" else "''"); i += 2
            } else { done = true; i += 1 }
          } else { sb += ch; i += 1 }
        }
        out += Str(sb.result())
      } else if (c.isDigit || ((c == '-' || c == '+') && i + 1 < n && (sql.charAt(i + 1).isDigit || sql.charAt(i + 1) == '.'))) {
        val start = i
        i += 1
        while (i < n && (sql.charAt(i).isDigit || sql.charAt(i) == '.' || sql.charAt(i) == 'e' || sql.charAt(i) == 'E' ||
               ((sql.charAt(i) == '-' || sql.charAt(i) == '+') && (sql.charAt(i - 1) == 'e' || sql.charAt(i - 1) == 'E')))) i += 1
        out += Num(sql.substring(start, i))
      } else if (isIdentStart(c)) {
        val start = i
        while (i < n && isIdentPart(sql.charAt(i))) i += 1
        val w = sql.substring(start, i)
        if (w.equalsIgnoreCase("NULL")) out += NullTok else out += Ident(w)
      } else { out += Sym(c); i += 1 }
    }
    out.result()
  }

  // ------------------------------------------------------------------ parser

  private final class Cursor(toks: Vector[Tok]) {
    var pos = 0
    def peek: Option[Tok]        = if (pos < toks.length) Some(toks(pos)) else None
    def next(): Tok              = { val t = toks(pos); pos += 1; t }
    def eof: Boolean             = pos >= toks.length
    def isKw(kw: String): Boolean = peek match {
      case Some(Ident(w)) => w.equalsIgnoreCase(kw)
      case _              => false
    }
    def expectKw(kw: String): Unit =
      if (isKw(kw)) { pos += 1 }
      else throw new IllegalArgumentException(s"expected keyword $kw at token $pos, got $peek")
    def expectSym(ch: Char): Unit = next() match {
      case Sym(`ch`) => ()
      case other     => throw new IllegalArgumentException(s"expected '$ch', got $other")
    }
    def ident(): String = next() match {
      case Ident(w) => w
      case other    => throw new IllegalArgumentException(s"expected identifier, got $other")
    }
  }

  /** `"OWNER"."TABLE"` or `TABLE` — returns (owner, table). */
  private def parseQualifiedName(c: Cursor): (String, String) = {
    val first = c.ident()
    c.peek match {
      case Some(Sym('.')) => c.next(); (first, c.ident())
      case _              => ("", first)
    }
  }

  /**
   * One scalar literal value. Handles: NULL, numbers, strings, `TIMESTAMP '…'` / `DATE '…'`
   * prefixed literals (prefix stripped per Utils:467-469), `TO_DATE('x','fmt')` /
   * `TO_TIMESTAMP('x')` (first argument taken), `EMPTY_CLOB()`/`EMPTY_BLOB()` (-> null),
   * and `UNSUPPORTED TYPE`-style bare idents (kept verbatim).
   */
  private def parseValue(c: Cursor): Option[String] = c.next() match {
    case NullTok    => None
    case Num(t)     => Some(t)
    case Str(v)     => Some(v)
    case Sym('-')   => parseValue(c).map(v => "-" + v)
    case Ident(w) if w.equalsIgnoreCase("TIMESTAMP") || w.equalsIgnoreCase("DATE") =>
      c.next() match {
        case Str(v) => Some(v)
        case other  => throw new IllegalArgumentException(s"expected string after $w, got $other")
      }
    case Ident(w) if w.equalsIgnoreCase("EMPTY_CLOB") || w.equalsIgnoreCase("EMPTY_BLOB") =>
      c.expectSym('('); c.expectSym(')'); None
    case Ident(w) if w.equalsIgnoreCase("TO_DATE") || w.equalsIgnoreCase("TO_TIMESTAMP") =>
      c.expectSym('(')
      val arg = c.next() match {
        case Str(v) => v
        case other  => throw new IllegalArgumentException(s"expected string in $w(), got $other")
      }
      // skip optional format argument(s)
      var depth = 1
      while (depth > 0 && !c.eof) c.next() match {
        case Sym('(') => depth += 1
        case Sym(')') => depth -= 1
        case _        => ()
      }
      Some(arg)
    case Ident(w) =>
      // Unknown function call or bare word (e.g. HEXTORAW(...)): capture verbatim-ish
      c.peek match {
        case Some(Sym('(')) =>
          val sb = new mutable.StringBuilder(w)
          sb += '('
          c.next()
          var depth = 1
          while (depth > 0 && !c.eof) c.next() match {
            case Sym('(')  => depth += 1; sb += '('
            case Sym(')')  => depth -= 1; if (depth > 0) sb += ')'
            case Sym(s)    => sb += s
            case Ident(x)  => sb ++= x
            case Num(t)    => sb ++= t
            case Str(v)    => sb += '\''; sb ++= v; sb += '\''
            case NullTok   => sb ++= "NULL"
          }
          sb += ')'
          Some(sb.result())
        case _ => Some(w)
      }
    case other => throw new IllegalArgumentException(s"unexpected value token $other")
  }

  /** WHERE clause: conjunction of `col = literal` / `col IS NULL` predicates (Utils:268,297-352). */
  private def parseWhere(c: Cursor): Vector[(String, Option[String])] = {
    val out = Vector.newBuilder[(String, Option[String])]
    var more = true
    while (more && !c.eof) {
      val col = c.ident()
      c.peek match {
        case Some(Sym('=')) =>
          c.next()
          out += (col -> parseValue(c))
        case Some(Ident(w)) if w.equalsIgnoreCase("IS") =>
          c.next()
          c.peek match {
            case Some(NullTok) => c.next(); out += (col -> None)
            case Some(Ident(x)) if x.equalsIgnoreCase("NOT") =>
              c.next()
              c.peek match { case Some(NullTok) => c.next() case _ => () }
              // `IS NOT NULL` carries no value information; reference never emits it in redo — skip.
            case other => throw new IllegalArgumentException(s"expected NULL after IS, got $other")
          }
        case other => throw new IllegalArgumentException(s"expected '=' or IS after $col, got $other")
      }
      if (c.isKw("and")) c.next() else more = false
    }
    out.result()
  }

  /** Parse one redo DML statement. Throws IllegalArgumentException on non-DML / malformed
    * input — INCLUDING statements with trailing out-of-grammar syntax (an OR disjunct, a
    * subquery, …): a half-parsed statement accepted ok=true would apply a truncated
    * before-image to the replica, so anything this grammar cannot consume to EOF must
    * fail and route to the DLQ (parseOpt -> None -> A25), mirroring the reference's
    * parse-failure posture (Thread:305-308). */
  def parse(sqlRedo: String, unescape: Boolean = true): ParsedDml = {
    val c = new Cursor(tokenize(sqlRedo.trim.stripSuffix(";"), unescape))
    val parsed = parseStatement(c)
    if (!c.eof)
      throw new IllegalArgumentException(
        s"trailing tokens after statement at token ${c.pos}: ${c.peek.getOrElse("")} — unsupported syntax")
    parsed
  }

  private def parseStatement(c: Cursor): ParsedDml = {
    if (c.isKw("insert")) {
      c.next(); c.expectKw("into")
      val (owner, table) = parseQualifiedName(c)
      c.expectSym('(')
      val cols = Vector.newBuilder[String]
      var more = true
      while (more) {
        cols += c.ident()
        c.next() match {
          case Sym(',') => ()
          case Sym(')') => more = false
          case other    => throw new IllegalArgumentException(s"bad insert column list: $other")
        }
      }
      c.expectKw("values")
      c.expectSym('(')
      val vals = Vector.newBuilder[Option[String]]
      more = true
      while (more) {
        vals += parseValue(c)
        c.next() match {
          case Sym(',') => ()
          case Sym(')') => more = false
          case other    => throw new IllegalArgumentException(s"bad insert values list: $other")
        }
      }
      val (cs, vs) = (cols.result(), vals.result())
      // zip would silently TRUNCATE on arity mismatch — a column would vanish from data
      // with ok=true and EnvelopeApply would treat it as never-set (NULL on INSERT); a
      // malformed statement must fail loudly to the DLQ instead
      if (cs.size != vs.size)
        throw new IllegalArgumentException(
          s"insert arity mismatch: ${cs.size} columns vs ${vs.size} values")
      ParsedDml("INSERT", owner, table, cs.zip(vs), Vector.empty)
    } else if (c.isKw("update")) {
      c.next()
      val (owner, table) = parseQualifiedName(c)
      c.expectKw("set")
      val sets = Vector.newBuilder[(String, Option[String])]
      var more = true
      while (more) {
        val col = c.ident()
        c.expectSym('=')
        sets += (col -> parseValue(c))
        c.peek match {
          case Some(Sym(',')) => c.next()
          case _              => more = false
        }
      }
      val before =
        if (c.isKw("where")) { c.next(); parseWhere(c) } else Vector.empty
      // data = before overlaid with SET columns, preserving before order, appending new SET cols
      val setMap  = sets.result()
      val beforeCols = before.map(_._1).toSet
      val overlaid = before.map { case (k, v) => k -> setMap.collectFirst { case (`k`, nv) => nv }.getOrElse(v) } ++
        setMap.filterNot { case (k, _) => beforeCols.contains(k) }
      ParsedDml("UPDATE", owner, table, overlaid, before)
    } else if (c.isKw("delete")) {
      c.next(); c.expectKw("from")
      val (owner, table) = parseQualifiedName(c)
      val before =
        if (c.isKw("where")) { c.next(); parseWhere(c) } else Vector.empty
      ParsedDml("DELETE", owner, table, Vector.empty, before)
    } else {
      throw new IllegalArgumentException(s"not a redo DML statement (starts with ${c.peek.getOrElse("<empty>")})")
    }
  }

  /** Safe variant: None on parse failure (reference logs-and-continues, Thread:305-308). */
  def parseOpt(sqlRedo: String, unescape: Boolean = true): Option[ParsedDml] =
    try Some(parse(sqlRedo, unescape)) catch { case _: Exception => None }
}
