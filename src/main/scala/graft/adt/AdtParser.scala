package graft.adt

/** Hand-rolled lexer + recursive-descent parser for the ADT query language.
  * Keywords are case-insensitive; identifiers (aliases, property names,
  * `$`-system keys) are case-sensitive, matching the reference's behavior
  * (its regexes use RegexOptions.IgnoreCase for keywords only,
  * AdtQueryHelpers.cs:23-41).
  */
object AdtParser {

  /** Upper bound applied to unbounded `[*]` expansions (safety cap; the
    * Vle engine itself converges at the true transitive closure). */
  val DefaultVleMax = 30

  // ---------------- lexer ----------------

  sealed trait Tok
  case class Ident(s: String) extends Tok            // includes $-prefixed
  case class Str(s: String) extends Tok
  case class Num(s: String) extends Tok
  case class Sym(s: String) extends Tok              // ( ) [ ] , . = != < > <= >= - ->
  case object EOF extends Tok

  def lex(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = q.length
    def peek(k: Int = 0): Char = if (i + k < n) q(i + k) else '\u0000'
    while (i < n) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') {
        val sb = new StringBuilder
        i += 1
        while (i < n && q(i) != '\'') { sb.append(q(i)); i += 1 }
        if (i >= n) throw new AdtParseException("unterminated string literal")
        i += 1
        out += Str(sb.toString)
      } else if (c.isDigit ||
          (c == '.' && peek(1).isDigit && !out.result().lastOption.contains(Sym("."))) ||
          (c == '-' && (peek(1).isDigit || peek(1) == '.') && lastIsOperand(out.result()) == false)) {
        val sb = new StringBuilder
        if (c == '-') { sb.append(c); i += 1 }
        // a second consecutive dot is the `..` range operator, not a decimal
        while (i < n && (q(i).isDigit || (q(i) == '.' && peek(1) != '.'))) {
          sb.append(q(i)); i += 1
        }
        if (i < n && (q(i) == 'e' || q(i) == 'E') &&
            (peek(1).isDigit || ((peek(1) == '+' || peek(1) == '-') && peek(2).isDigit))) {
          sb.append(q(i)); i += 1
          if (q(i) == '+' || q(i) == '-') { sb.append(q(i)); i += 1 }
          while (i < n && q(i).isDigit) { sb.append(q(i)); i += 1 }
        }
        out += Num(sb.toString)
      } else if (c.isLetter || c == '_' || c == '$') {
        val sb = new StringBuilder
        while (i < n && (q(i).isLetterOrDigit || q(i) == '_' || q(i) == '$')) {
          sb.append(q(i)); i += 1
        }
        out += Ident(sb.toString)
      } else c match {
        case '!' if peek(1) == '=' => out += Sym("!="); i += 2
        case '<' if peek(1) == '=' => out += Sym("<="); i += 2
        case '>' if peek(1) == '=' => out += Sym(">="); i += 2
        case '<' if peek(1) == '-' => out += Sym("<-"); i += 2
        case '-' if peek(1) == '>' => out += Sym("->"); i += 2
        case '(' | ')' | '[' | ']' | '{' | '}' | ',' | '.' | '=' | '<' | '>' | '-' | ':' | '|' | '*' | '+' | '/' | '%' =>
          out += Sym(c.toString); i += 1
        case other => throw new AdtParseException(s"unexpected character '$other' at $i")
      }
    }
    out += EOF
    out.result()
  }

  private def lastIsOperand(toks: Vector[Tok]): Boolean = toks.lastOption match {
    case Some(Ident(_)) | Some(Str(_)) | Some(Num(_)) | Some(Sym(")")) | Some(Sym("]")) => true
    case _ => false
  }

  // ---------------- parser ----------------

  def parse(q: String): AdtQuery = new P(lex(q)).query()

  private final class P(toks: Vector[Tok]) {
    private var pos = 0
    private def cur: Tok = toks(pos)
    private def advance(): Tok = { val t = cur; pos += 1; t }
    private def isKw(t: Tok, kw: String): Boolean = t match {
      case Ident(s) => s.equalsIgnoreCase(kw)
      case _ => false
    }
    private def expectKw(kw: String): Unit =
      if (isKw(cur, kw)) pos += 1
      else throw new AdtParseException(s"expected $kw, found $cur")
    private def expectSym(s: String): Unit = cur match {
      case Sym(`s`) => pos += 1
      case t => throw new AdtParseException(s"expected '$s', found $t")
    }
    private def ident(): String = advance() match {
      case Ident(s) => s
      case t => throw new AdtParseException(s"expected identifier, found $t")
    }

    def query(): AdtQuery = {
      expectKw("SELECT")
      val top = parseTop()
      val items = parseItems()
      expectKw("FROM")
      val from = advance() match {
        case Ident(s) if s.equalsIgnoreCase("DIGITALTWINS") =>
          FromTwins(peekAlias())
        case Ident(s) if s.equalsIgnoreCase("RELATIONSHIPS") =>
          FromRelationships(peekAlias())
        case t => throw new AdtParseException(s"expected DIGITALTWINS or RELATIONSHIPS, found $t")
      }
      val matches = if (isKw(cur, "MATCH")) { pos += 1; parseMatchChain() } else Nil
      val joins = collection.mutable.ListBuffer[JoinRelated]()
      while (isKw(cur, "JOIN")) { pos += 1; joins += parseJoinRelated() }
      val where = if (isKw(cur, "WHERE")) { pos += 1; Some(orExpr()) } else None
      cur match {
        case EOF =>
        case t => throw new AdtParseException(s"unexpected trailing token $t")
      }
      AdtQuery(top, items, from, matches, joins.toList, where)
    }

    /** TOP(n) or TOP (n); bare `SELECT TOP(n) FROM` means `*`. */
    private def parseTop(): Option[Int] =
      if (isKw(cur, "TOP")) {
        pos += 1; expectSym("(")
        val v = advance() match {
          case Num(s) => s.toInt
          case t => throw new AdtParseException(s"expected number in TOP, found $t")
        }
        expectSym(")")
        Some(v)
      } else None

    private def parseItems(): List[SelectItem] = {
      if (isKw(cur, "FROM")) return List(SelectStar) // SELECT TOP(n) FROM ...
      cur match {
        case Sym("*") => pos += 1; return List(SelectStar)
        case _ =>
      }
      val items = collection.mutable.ListBuffer[SelectItem]()
      var more = true
      while (more) {
        items += parseItem()
        cur match {
          case Sym(",") => pos += 1
          case _ => more = false
        }
      }
      items.toList
    }

    private def parseItem(): SelectItem = {
      if (isKw(cur, "COUNT") && toks(pos + 1) == Sym("(")) {
        pos += 2; expectSym(")"); return SelectCount
      }
      val first = ident()
      val path = collection.mutable.ListBuffer[String]()
      while (cur == Sym(".")) { pos += 1; path += ident() }
      val as = if (isKw(cur, "AS")) { pos += 1; Some(ident()) } else None
      if (path.isEmpty) {
        if (first.startsWith("$")) SelectProp(None, List(first), as)
        else if (as.isEmpty) SelectEntity(first)   // resolved to prop later if not an alias
        else SelectProp(None, List(first), as)
      } else SelectProp(Some(first), path.toList, as)
    }

    private def peekAlias(): Option[String] = cur match {
      case Ident(s) if !reserved(s) => pos += 1; Some(s)
      case _ => None
    }

    private def reserved(s: String): Boolean =
      Set("MATCH", "JOIN", "WHERE", "RELATED", "FROM", "SELECT", "TOP", "AND",
        "OR", "NOT", "IN").contains(s.toUpperCase)

    /** (a)-[r:l1|l2]->(b)-[r2]->(c), reverse arrows normalized forward. */
    private def parseMatchChain(): List[MatchEdge] = {
      val edges = collection.mutable.ListBuffer[MatchEdge]()
      var left = parseNode()
      var more = true
      while (more) {
        cur match {
          case Sym("-") => // -[r]-> right
            pos += 1
            val (relAlias, relNames, vle) = parseRel()
            expectSym("->")
            val right = parseNode()
            edges += MatchEdge(left, relAlias, relNames, right, vle)
            left = right
          case Sym("<-") => // <-[r]- left (reversed)
            pos += 1
            val (relAlias, relNames, vle) = parseRel()
            expectSym("-")
            val right = parseNode()
            edges += MatchEdge(right, relAlias, relNames, left, vle)
            left = right
          case Sym(",") if toks(pos + 1) == Sym("(") => // comma-joined patterns
            pos += 1
            left = parseNode()
          case _ => more = false
        }
      }
      edges.toList
    }

    private var anonCounter = 0
    private def freshAnon(): String = { anonCounter += 1; s"__anon$anonCounter" }

    private def parseNode(): String = {
      expectSym("(")
      val alias = cur match {
        case Ident(s) => pos += 1; s
        case _ => freshAnon()
      }
      expectSym(")")
      alias
    }

    /** `[r:name1|name2]`, `[]`, and variable-length forms `[*]`,
      * `[r*2..6]`, `[:name*..3]` (Cypher VLE accepted by the reference's
      * pass-through path, VariableLengthEdgeTests.cs). */
    private def parseRel(): (Option[String], List[String], Option[(Int, Int)]) = {
      expectSym("[")
      val alias = cur match {
        case Ident(s) => pos += 1; Some(s)
        case _ => None
      }
      val names = collection.mutable.ListBuffer[String]()
      if (cur == Sym(":")) {
        pos += 1
        names += ident()
        while (cur == Sym("|")) { pos += 1; names += ident() }
      }
      val vle: Option[(Int, Int)] = cur match {
        case Sym("*") =>
          pos += 1
          // Option distinguishes bare '*' (no depth consumed) from '*1':
          // both leave lo=1 but '*1' means EXACTLY one hop, not 1..max.
          val loOpt = cur match {
            case Num(s) => pos += 1; Some(s.toInt)
            case _ => None
          }
          val lo = loOpt.getOrElse(1)
          val hi = cur match {
            case Sym(".") if toks(pos + 1) == Sym(".") =>
              pos += 2
              cur match {
                case Num(s) => pos += 1; s.toInt
                case _ => DefaultVleMax
              }
            case _ => if (loOpt.isEmpty) DefaultVleMax else lo // '*' vs exact '*n'
          }
          Some((lo, hi))
        case _ => None
      }
      expectSym("]")
      (alias, names.toList, vle)
    }

    /** JOIN tgt RELATED src.relName [relAlias] */
    private def parseJoinRelated(): JoinRelated = {
      val target = ident()
      expectKw("RELATED")
      val source = ident()
      expectSym(".")
      val relName = ident()
      val relAlias = cur match {
        case Ident(s) if !reserved(s) => pos += 1; Some(s)
        case _ => None
      }
      JoinRelated(target, source, relName, relAlias)
    }

    // -------- WHERE expression (precedence: OR < AND < NOT < cmp) --------

    private def orExpr(): Expr = {
      var l = andExpr()
      while (isKw(cur, "OR")) { pos += 1; l = Or(l, andExpr()) }
      l
    }

    private def andExpr(): Expr = {
      var l = notExpr()
      while (isKw(cur, "AND")) { pos += 1; l = And(l, notExpr()) }
      l
    }

    private def notExpr(): Expr =
      if (isKw(cur, "NOT")) { pos += 1; Not(notExpr()) } else cmpExpr()

    private def cmpExpr(): Expr = {
      val l = operand()
      cur match {
        case Sym(op @ ("=" | "!=" | "<" | ">" | "<=" | ">=")) =>
          pos += 1
          Cmp(op, l, operand())
        case Ident(s) if s.equalsIgnoreCase("IN") =>
          pos += 1
          In(l, literalList())
        case _ => l
      }
    }

    private def literalList(): List[Lit] = {
      expectSym("[")
      val vals = collection.mutable.ListBuffer[Lit]()
      var more = cur != Sym("]")
      while (more) {
        vals += literal()
        cur match {
          case Sym(",") => pos += 1
          case _ => more = false
        }
      }
      expectSym("]")
      vals.toList
    }

    private def literal(): Lit = advance() match {
      case Str(s) => StrLit(s)
      case Num(s) => NumLit(s.toDouble, !s.contains('.'))
      case Ident(s) if s.equalsIgnoreCase("true") => BoolLit(true)
      case Ident(s) if s.equalsIgnoreCase("false") => BoolLit(false)
      case t => throw new AdtParseException(s"expected literal, found $t")
    }

    // recursion guard: pathological nesting must fail as a parse error,
    // not a StackOverflowError that kills the serving thread (found by
    // ParserFuzzSpec with 5000 nested parens)
    private var parenDepth = 0

    private def operand(): Expr = cur match {
      case Sym("(") =>
        pos += 1
        parenDepth += 1
        if (parenDepth > 200)
          throw new AdtParseException("expression nesting too deep (> 200)")
        val e = orExpr()
        parenDepth -= 1
        expectSym(")")
        e
      case Str(_) | Num(_) => literal()
      case Ident(s) if s.equalsIgnoreCase("true") || s.equalsIgnoreCase("false") =>
        literal()
      case Ident(name) if toks(pos + 1) == Sym("(") && AdtFunctions.isFunction(name) =>
        pos += 2
        val args = collection.mutable.ListBuffer[Expr]()
        if (cur != Sym(")")) {
          args += operand()
          while (cur == Sym(",")) { pos += 1; args += operand() }
        }
        expectSym(")")
        FnCall(name.toUpperCase, args.toList)
      case Ident(name) if toks(pos + 1) == Sym("(") =>
        throw new AdtParseException(
          s"unknown function $name (supported: ${AdtFunctions.names.toSeq.sorted.mkString(", ")})")
      case Ident(_) =>
        val first = ident()
        val path = collection.mutable.ListBuffer[String]()
        while (cur == Sym(".")) { pos += 1; path += ident() }
        if (path.isEmpty) PropRef(None, List(first))
        else PropRef(Some(first), path.toList) // resolved to entity-or-path at plan time
      case t => throw new AdtParseException(s"unexpected token $t in expression")
    }
  }
}

object AdtFunctions {
  val names: Set[String] = Set(
    "IS_OF_MODEL", "STARTSWITH", "ENDSWITH", "CONTAINS", "ARRAY_CONTAINS",
    "IS_NULL", "IS_DEFINED", "IS_BOOL", "IS_NUMBER", "IS_STRING",
    "IS_OBJECT", "IS_PRIMITIVE")

  def isFunction(s: String): Boolean = names.contains(s.toUpperCase)
}

final class AdtParseException(msg: String) extends RuntimeException(msg)
