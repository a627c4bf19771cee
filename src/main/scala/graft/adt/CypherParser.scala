package graft.adt

/** Cypher-subset front end — the second query language the reference's
  * endpoint accepts (language detection at AgeDigitalTwinsClient.Query.cs:
  * 44-55 of /root/reference: contains SELECT and no RETURN ⇒ ADT, else raw
  * Cypher executed by AGE). We parse the subset the reference's tests and
  * internal queries exercise straight into the same [[AdtQuery]] AST:
  *
  *   MATCH (a:Twin {`$dtId`: 'x'})-[r:name|other*2..6]->(b:Twin)[, ...]
  *   [WHERE expr]   =, <>, <, >, <=, >=, IN, AND/OR/NOT, STARTS WITH,
  *                  ENDS WITH, CONTAINS, IS [NOT] NULL, label(r),
  *                  a.prop / a.`$key` / a['$key'] access
  *   RETURN [DISTINCT] items | COUNT(*)
  *   [ORDER BY item [ASC|DESC], ...] [SKIP n] [LIMIT n]
  */
object CypherParser {

  import AdtParser.{Tok, Ident, Str, Num, Sym, EOF}

  /** Lex with backtick-quoted identifiers folded into plain Idents. */
  def lex(q: String): Vector[Tok] = {
    // replace backtick-quoted spans with placeholder idents the base lexer
    // accepts, then restore
    val restored = collection.mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    var i = 0
    while (i < q.length) {
      if (q(i) == '`') {
        val end = q.indexOf('`', i + 1)
        if (end < 0) throw new AdtParseException("unterminated backtick identifier")
        restored += q.substring(i + 1, end)
        sb.append(s" __bq${restored.size - 1} ")
        i = end + 1
      } else { sb.append(q(i)); i += 1 }
    }
    AdtParser.lex(sb.toString).map {
      case Ident(s) if s.startsWith("__bq") => Ident(restored(s.drop(4).toInt))
      case t => t
    }
  }

  def parse(q: String): AdtQuery = new P(lex(q)).query()

  private final class P(toks: Vector[Tok]) {
    private var pos = 0
    private def cur: Tok = toks(pos)
    private def nxt: Tok = toks(math.min(pos + 1, toks.length - 1))
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
      case Ident(s) => checkNotReserved(s)
      case t => throw new AdtParseException(s"expected identifier, found $t")
    }
    /** User identifiers may not collide with the internal anonymous
      * namespace: RETURN * (and other places) filter [[InternalAlias]]
      * shapes as planner-internal, so a user binding with such a name
      * would be silently dropped instead of projected — reject at parse.
      * Scoped to the exact shapes (prefix + digit), so identifiers like
      * `__related` stay legal. */
    private def checkNotReserved(s: String): String =
      if (InternalAlias.is(s)) throw new AdtParseException(
        s"identifier '$s' matches a reserved internal alias shape " +
          "(__cnode<n>/__rel<n>/__srel<n>/__srelmap<n>)")
      else s

    private var anon = 0
    private def freshAnon(): String = { anon += 1; s"__cnode$anon" }
    private val propFilters = collection.mutable.ListBuffer[Expr]()
    private val nodeLabels = collection.mutable.Map[String, String]()

    def query(): AdtQuery = {
      val edges = collection.mutable.ListBuffer[MatchEdge]()
      val loneNodes = collection.mutable.ListBuffer[String]()
      val pipeline = collection.mutable.ListBuffer[PipeClause]()
      var where: Option[Expr] = None
      var hadMatch = false
      if (isKw(cur, "MATCH")) {
        pos += 1; hadMatch = true
        parsePatterns(edges, loneNodes)
        if (isKw(cur, "WHERE")) { pos += 1; where = Some(orExpr()) }
        // OPTIONAL MATCH clauses: left-outer pattern extensions. A WHERE
        // (and any inline property map) scopes to the optional pattern —
        // it lands in the left-outer join condition, so a failing
        // predicate null-extends rather than dropping the outer row.
        while (isKw(cur, "OPTIONAL")) {
          pos += 1; expectKw("MATCH")
          val filtersBefore = propFilters.size
          val edgesBefore = edges.size
          parsePatterns(edges, loneNodes, optional = true)
          attachOptWhere(edges, edgesBefore, filtersBefore)
        }
      } else if (!isKw(cur, "UNWIND"))
        throw new AdtParseException(s"expected MATCH or UNWIND, found $cur")
      // pipeline clauses: WITH projection/aggregation horizons, UNWIND
      // list expansion, and MATCH stages after a horizon, in source order
      var inPipeline = true
      while (inPipeline) {
        if (isKw(cur, "UNWIND")) {
          pos += 1
          val src: Expr = if (cur == Sym("[")) parseListLit() else propRef()
          expectKw("AS")
          pipeline += UnwindClause(src, ident())
        } else if (isKw(cur, "WITH")) {
          pos += 1
          val d = if (isKw(cur, "DISTINCT")) { pos += 1; true } else false
          val items = parseReturnItems()
          val ob = parseOrderBy()
          val sk = if (isKw(cur, "SKIP")) { pos += 1; Some(num()) } else None
          val lim = if (isKw(cur, "LIMIT")) { pos += 1; Some(num()) } else None
          val w = if (isKw(cur, "WHERE")) { pos += 1; Some(orExpr()) } else None
          pipeline += WithClause(items, w, d, ob, sk, lim)
        } else if (pipeline.nonEmpty && isKw(cur, "MATCH")) {
          pos += 1
          val stageEdges = collection.mutable.ListBuffer[MatchEdge]()
          val stageLone = collection.mutable.ListBuffer[String]()
          // inline property maps of THIS stage scope to this stage's WHERE,
          // not the pre-pipeline one
          val filtersBefore = propFilters.size
          parsePatterns(stageEdges, stageLone)
          if (stageEdges.exists(_.pathAlias.isDefined))
            throw new AdtParseException(
              "path variables in a MATCH after a WITH/UNWIND stage are " +
                "not supported")
          val mapFilters = propFilters.drop(filtersBefore).toList
          propFilters.remove(filtersBefore, propFilters.size - filtersBefore)
          val w = if (isKw(cur, "WHERE")) { pos += 1; Some(orExpr()) } else None
          val allW = (mapFilters ++ w.toList) match {
            case Nil => None
            case one :: Nil => Some(one)
            case many => Some(many.reduce(And))
          }
          pipeline += MatchClause(stageEdges.toList, stageLone.toList, allW)
        } else if (pipeline.nonEmpty && isKw(cur, "OPTIONAL")) {
          pos += 1; expectKw("MATCH")
          val stageEdges = collection.mutable.ListBuffer[MatchEdge]()
          val stageLone = collection.mutable.ListBuffer[String]()
          val filtersBefore = propFilters.size
          parsePatterns(stageEdges, stageLone, optional = true)
          if (stageLone.nonEmpty || stageEdges.exists(_.pathAlias.isDefined))
            throw new AdtParseException(
              "OPTIONAL MATCH after a stage supports plain edge patterns only")
          attachOptWhere(stageEdges, edgesBefore = 0, filtersBefore)
          pipeline += MatchClause(stageEdges.toList, Nil, None)
        } else inPipeline = false
      }
      expectKw("RETURN")
      val distinct = if (isKw(cur, "DISTINCT")) { pos += 1; true } else false
      // RETURN *: every NAMED binding (nodes, then relationships, in
      // pattern order; anonymous `__cnode` aliases and path variables
      // stay internal). After a WITH/UNWIND horizon the in-scope set is
      // the horizon's — deferred to the planner via SelectStar.
      val items = if (cur == Sym("*")) {
        pos += 1
        if (pipeline.nonEmpty) {
          // after a WITH/UNWIND/MATCH pipeline the in-scope set is the
          // LAST horizon's, which only the planner knows — emit
          // SelectStar and let it expand the live scope (retained
          // entities + flat columns, name-sorted: the Neo4j RETURN *
          // order). Whether a pre-pipeline path variable survived the
          // horizons is only known at plan time (planWith keeps a path
          // alive exactly when its rel alias is retained) — the planner's
          // SelectStar branch errors loudly when scope.paths is non-empty,
          // so no guess is needed here.
          List(SelectStar)
        } else {
        // A bound path variable expands in the star as its
        // (nodes, rels, depth) columns — the planner knows the binding's
        // shape (single edge vs VLE interior), so defer like the
        // pipeline case does.
        if (edges.exists(_.pathAlias.isDefined)) List(SelectStar)
        else {
        val named = collection.mutable.LinkedHashSet[String]()
        loneNodes.filterNot(InternalAlias.is).foreach(named += _)
        edges.foreach { e =>
          Seq(e.src, e.dst).filterNot(InternalAlias.is).foreach(named += _)
          // synthesized aliases (__rel$i/__srelmap$n) are internal — a
          // user never named them, so the star must not project them;
          // exact-shape matching keeps e.g. `__srelevant` projectable
          e.relAlias.filterNot(InternalAlias.is).foreach(named += _)
        }
        if (named.isEmpty) throw new AdtParseException(
          "RETURN * with no named bindings in the pattern")
        named.toList.map(SelectEntity)
        }
        }
      } else parseReturnItems()
      val orderBy = parseOrderBy()
      val skip = if (isKw(cur, "SKIP")) { pos += 1; Some(num()) } else None
      val limit = if (isKw(cur, "LIMIT")) { pos += 1; Some(num()) } else None
      cur match {
        case EOF =>
        case t => throw new AdtParseException(s"unexpected trailing token $t")
      }
      val allWhere = (propFilters.toList ++ where.toList) match {
        case Nil => None
        case one :: Nil => Some(one)
        case many => Some(many.reduce(And))
      }
      // lone-node alias carries through even when edges exist: a bare
      // `MATCH (t)` binding may be the seed OPTIONAL MATCH hangs off
      val from =
        if (!hadMatch) FromUnit
        else FromTwins(loneNodes.headOption)
      AdtQuery(limit, items, from, edges.toList, Nil, allWhere,
        skip, orderBy, distinct, pipeline.toList, loneNodes.toList,
        nodeLabels.toMap)
    }

    /** `[ORDER BY expr [ASC|DESC], ...]` — shared by RETURN and WITH;
      * full value expressions (arithmetic, scalar calls, CASE), not just
      * property references. */
    private def parseOrderBy(): List[(Expr, Boolean)] = {
      if (!isKw(cur, "ORDER")) return Nil
      pos += 1; expectKw("BY")
      val out = collection.mutable.ListBuffer[(Expr, Boolean)]()
      var more = true
      while (more) {
        val e = valueExpr()
        val asc =
          if (isKw(cur, "DESC")) { pos += 1; false }
          else { if (isKw(cur, "ASC")) pos += 1; true }
        out += ((e, asc))
        if (cur == Sym(",")) pos += 1 else more = false
      }
      out.toList
    }

    private def parseListLit(): ListLit = {
      expectSym("[")
      val vals = collection.mutable.ListBuffer[Lit]()
      var more = cur != Sym("]")
      while (more) {
        vals += literal()
        if (cur == Sym(",")) pos += 1 else more = false
      }
      expectSym("]")
      ListLit(vals.toList)
    }

    private def num(): Int = advance() match {
      case Num(s) => s.toInt
      case t => throw new AdtParseException(s"expected number, found $t")
    }

    /** Scoped WHERE / inline property maps of an OPTIONAL MATCH attach to
      * its single edge — the planner folds them into the left-outer join
      * condition so a failing predicate null-extends. Shared by the
      * top-level and pipeline-stage forms. */
    private def attachOptWhere(edges: collection.mutable.ListBuffer[MatchEdge],
        edgesBefore: Int, filtersBefore: Int): Unit = {
      val mapFilters = propFilters.drop(filtersBefore).toList
      propFilters.remove(filtersBefore, propFilters.size - filtersBefore)
      val w = if (isKw(cur, "WHERE")) { pos += 1; Some(orExpr()) } else None
      (mapFilters ++ w.toList).reduceOption(And).foreach { expr =>
        if (edges.size - edgesBefore != 1) throw new AdtParseException(
          "WHERE/property maps on OPTIONAL MATCH are supported for " +
            "single-edge patterns only")
        edges(edges.size - 1) = edges.last.copy(optWhere = Some(expr))
      }
    }

    private def parsePatterns(edges: collection.mutable.ListBuffer[MatchEdge],
        loneNodes: collection.mutable.ListBuffer[String],
        optional: Boolean = false): Unit = {
      var more = true
      while (more) {
        // path variable binding: `p = (a)-[r]->(b)`,
        // `p = (a)-[*1..3]->(b)` (per-path, interiors enumerated), or
        // `p = shortestPath((a)-[*..n]->(b))` (per endpoint pair at the
        // VLE pair set's minimal depth).
        var pathAlias: Option[String] = None
        var shortest = false
        (cur, nxt) match {
          case (Ident(p), Sym("=")) =>
            pathAlias = Some(checkNotReserved(p)); pos += 2
            if (isKw(cur, "shortestPath")) { shortest = true; pos += 1; expectSym("(") }
          case _ =>
        }
        val edgesBefore = edges.size
        var left = parseNode()
        var hadEdge = false
        var chaining = true
        while (chaining) {
          cur match {
            case Sym("-") =>
              pos += 1
              val (relAlias, relNames, vle) = parseRelBody()
              expectSym("->")
              val right = parseNode()
              edges += MatchEdge(left, relAlias, relNames, right, vle, optional)
              left = right; hadEdge = true
            case Sym("<-") =>
              pos += 1
              val (relAlias, relNames, vle) = parseRelBody()
              expectSym("-")
              val right = parseNode()
              edges += MatchEdge(right, relAlias, relNames, left, vle, optional,
                pathForward = false)
              left = right; hadEdge = true
            case _ => chaining = false
          }
        }
        if (shortest) expectSym(")")
        pathAlias.foreach { _ =>
          if (edges.size - edgesBefore != 1) throw new AdtParseException(
            "a path variable must bind a single-edge pattern")
          // a bare VLE path (`p = (a)-[*1..3]->(b)`) is legal: it binds one
          // row per path, with interiors, while shortestPath keeps the
          // cheaper one-row-per-pair minimal-depth plan. The planner caps
          // the bare form's range (per-path enumeration of an unbounded
          // VLE is combinatorial).
          edges(edges.size - 1) =
            edges.last.copy(pathAlias = pathAlias, shortest = shortest)
        }
        if (!hadEdge) loneNodes += left
        if (cur == Sym(",")) pos += 1 else more = false
      }
    }

    /** `(alias[:Label][{k: v, ...}])` — label ignored (everything is Twin);
      * the property map becomes WHERE equality conjuncts. */
    private def parseNode(): String = {
      expectSym("(")
      val alias = cur match {
        case Ident(s) => pos += 1; checkNotReserved(s)
        case _ => freshAnon()
      }
      if (cur == Sym(":")) { // record the label; `:Model` routes planning
        pos += 1
        nodeLabels(alias) = ident()
      }
      if (cur == Sym("{")) {
        pos += 1
        var more = cur != Sym("}")
        while (more) {
          val key = ident()
          expectSym(":")
          val v = literal()
          propFilters += Cmp("=", PropRef(Some(alias), List(key)), v)
          if (cur == Sym(",")) pos += 1 else more = false
        }
        expectSym("}")
      }
      expectSym(")")
      alias
    }

    private def parseRelBody(): (Option[String], List[String], Option[(Int, Int)]) = {
      expectSym("[")
      val alias = cur match {
        case Ident(s) => pos += 1; Some(checkNotReserved(s))
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
          // Option distinguishes bare '*' from exact-depth '*1' (see AdtParser)
          val loOpt = cur match { case Num(s) => pos += 1; Some(s.toInt); case _ => None }
          val lo = loOpt.getOrElse(1)
          val hi = cur match {
            case Sym(".") if toks(pos + 1) == Sym(".") =>
              pos += 2
              cur match {
                case Num(s) => pos += 1; s.toInt
                case _ => AdtParser.DefaultVleMax
              }
            case _ => if (loOpt.isEmpty) AdtParser.DefaultVleMax else lo
          }
          Some((lo, hi))
        case _ => None
      }
      // inline relationship property map `[r:name {k: v}]` — lowered to
      // equality predicates on the rel alias, exactly like node maps
      // (openCypher pattern-map semantics). An ANONYMOUS rel with a map
      // (`[:name {k: v}]`, AGE-legal) gets a parse-time internal alias
      // (`__srelmap$n`) to hang the predicates on — internal prefixes are
      // reserved at the identifier level and filtered from every RETURN *
      // expansion, so the synthesized binding cannot leak (r16; the prior
      // loud error predated that filtering).
      var outAlias = alias
      if (cur == Sym("{")) {
        val a = alias.getOrElse { anon += 1; s"__srelmap$anon" }
        outAlias = Some(a) // the synthesized binding must BE the edge's
                           // rel alias, or the predicates resolve nothing
        if (vle.isDefined) throw new AdtParseException(
          "a property map on a variable-length edge is not supported " +
            "(the alias binds a path's edge SET, not one relationship)")
        pos += 1
        var more = cur != Sym("}")
        while (more) {
          val key = ident()
          expectSym(":")
          val v = literal()
          propFilters += Cmp("=", PropRef(Some(a), List(key)), v)
          if (cur == Sym(",")) pos += 1 else more = false
        }
        expectSym("}")
      }
      expectSym("]")
      (outAlias, names.toList, vle)
    }

    private val aggFns = Set("COUNT", "SUM", "AVG", "MIN", "MAX", "COLLECT",
      "STDEV", "STDEVP", "PERCENTILECONT", "PERCENTILEDISC")
    private val scalarFns = Set("SIZE", "COALESCE", "TOUPPER", "TOLOWER",
      "TOSTRING", "KEYS", "PROPERTIES", "NODES", "RELATIONSHIPS",
      "TOINTEGER", "TOFLOAT", "ABS", "ROUND", "CEIL", "FLOOR",
      "SUBSTRING", "REPLACE", "TRIM", "SPLIT", "REVERSE", "LABELS",
      "RANGE", "HEAD", "LAST")

    /** fn(arg [, arg]*) where args are full value expressions. */
    private def scalarCall(): FnCall = {
      val fn = ident().toUpperCase
      expectSym("(")
      val args = collection.mutable.ListBuffer[Expr]()
      if (cur != Sym(")")) {
        var more = true
        while (more) {
          args += valueExpr()
          if (cur == Sym(",")) pos += 1 else more = false
        }
      }
      expectSym(")")
      if (args.isEmpty) throw new AdtParseException(s"$fn() needs arguments")
      FnCall(fn, args.toList)
    }

    // ---- value expressions: additive < multiplicative < unary < atom ----

    private def valueExpr(): Expr = addExpr()

    private def addExpr(): Expr = {
      var l = mulExpr()
      var more = true
      while (more) cur match {
        case Sym(op @ ("+" | "-")) => pos += 1; l = Arith(op, l, mulExpr())
        case _ => more = false
      }
      l
    }

    private def mulExpr(): Expr = {
      var l = unaryExpr()
      var more = true
      while (more) cur match {
        case Sym(op @ ("*" | "/" | "%")) => pos += 1; l = Arith(op, l, unaryExpr())
        case _ => more = false
      }
      l
    }

    private def unaryExpr(): Expr = cur match {
      case Sym("-") => pos += 1; Arith("-", NumLit(0, isInt = true), unaryExpr())
      case _ => atomExpr()
    }

    // recursion guard shared by the two paren-grouping sites: deep
    // nesting must throw AdtParseException, never StackOverflowError
    private var parenDepth = 0
    private def enterParen(): Unit = {
      parenDepth += 1
      if (parenDepth > 200)
        throw new AdtParseException("expression nesting too deep (> 200)")
    }

    private def atomExpr(): Expr = cur match {
      case Sym("(") =>
        pos += 1; enterParen()
        val e = valueExpr(); parenDepth -= 1; expectSym(")"); e
      case Str(_) | Num(_) => literal()
      // `[x IN src ...]` list comprehension vs `[lit, ...]` list literal —
      // disambiguated by the `ident IN` prefix
      case Sym("[") if nxt.isInstanceOf[Ident] &&
          isKw(toks(math.min(pos + 2, toks.length - 1)), "IN") =>
        parseListComp()
      case Sym("[") => parseListLit()
      case Ident(s) if s.equalsIgnoreCase("CASE") => parseCase()
      case Ident(f) if f.equalsIgnoreCase("reduce") && nxt == Sym("(") =>
        parseReduce()
      // length(p) composes in expressions (`length(p) + 1`); the __length
      // pseudo-property resolves against the path binding at plan time
      case Ident(f) if f.equalsIgnoreCase("length") && nxt == Sym("(") =>
        pos += 2
        val p = ident()
        expectSym(")")
        PropRef(Some(p), List("__length"))
      case Ident(s) if (s.equalsIgnoreCase("true") || s.equalsIgnoreCase("false")) &&
        nxt != Sym("(") => literal()
      case Ident(f) if scalarFns(f.toUpperCase) && nxt == Sym("(") => scalarCall()
      case _ => propRef()
    }

    private val listPredFns = Set("ANY", "ALL", "NONE", "SINGLE")

    /** `any/all/none/single(x IN src WHERE p)` → size comparisons over
      * `[x IN src WHERE p]`. NULL-predicate contract (a comprehension
      * DROPS elements whose predicate is NULL, exactly like a WHERE row):
      * each desugaring counts only definite matches, so an element whose
      * predicate is NULL can never satisfy `all`/`none`/`single` — the
      * quantifier yields false where openCypher ternary logic yields NULL.
      * In the WHERE position (the only place the planner accepts these),
      * false and NULL both filter the row, so observable semantics match
      * AGE/openCypher. Pre-r13, `all` counted NULLs as non-counterexamples
      * (size([x WHERE NOT p])=0) and diverged: all-NULL predicates passed. */
    private def parseListPredicate(kind: String): Expr = {
      pos += 2 // fn (
      val v = ident()
      expectKw("IN")
      val src = valueExpr()
      expectKw("WHERE")
      val pred = orExpr()
      expectSym(")")
      def kept(p: Expr) = FnCall("SIZE", List(ListComp(v, src, Some(p), None)))
      val total = FnCall("SIZE", List(src))
      kind match {
        // ∃ definite true
        case "ANY"    => Cmp(">", kept(pred), NumLit(0, isInt = true))
        // every element definitely true (a NULL shrinks the kept count)
        case "ALL"    => Cmp("=", kept(pred), total)
        // every element definitely false
        case "NONE"   => Cmp("=", kept(Not(pred)), total)
        // exactly one definite true, all others definitely false
        case "SINGLE" => And(
          Cmp("=", kept(pred), NumLit(1, isInt = true)),
          Cmp("=", kept(Not(pred)),
            Arith("-", total, NumLit(1, isInt = true))))
      }
    }

    /** `[x IN src (WHERE pred)? (| out)?]` — filter and projection both
      * optional per openCypher. */
    private def parseListComp(): ListComp = {
      expectSym("[")
      val v = ident()
      expectKw("IN")
      val src = valueExpr()
      val where = if (isKw(cur, "WHERE")) { pos += 1; Some(orExpr()) } else None
      val out = if (cur == Sym("|")) { pos += 1; Some(valueExpr()) } else None
      expectSym("]")
      ListComp(v, src, where, out)
    }

    /** `reduce(acc = init, x IN src | expr)`. */
    private def parseReduce(): ReduceExpr = {
      pos += 2 // reduce (
      val acc = ident()
      expectSym("=")
      val init = valueExpr()
      expectSym(",")
      val v = ident()
      expectKw("IN")
      val src = valueExpr()
      expectSym("|")
      val out = valueExpr()
      expectSym(")")
      ReduceExpr(acc, init, v, src, out)
    }

    /** CASE [x] WHEN cond-or-value THEN e ... [ELSE e] END. The simple form
      * (scrutinee present) desugars each WHEN value into an equality. */
    private def parseCase(): Expr = {
      pos += 1 // CASE
      val scrutinee = if (isKw(cur, "WHEN")) None else Some(valueExpr())
      val branches = collection.mutable.ListBuffer[(Expr, Expr)]()
      while (isKw(cur, "WHEN")) {
        pos += 1
        val cond = scrutinee match {
          case Some(s) => Cmp("=", s, valueExpr())
          case None => orExpr()
        }
        expectKw("THEN")
        branches += ((cond, valueExpr()))
      }
      if (branches.isEmpty)
        throw new AdtParseException("CASE needs at least one WHEN branch")
      val els = if (isKw(cur, "ELSE")) { pos += 1; Some(valueExpr()) } else None
      expectKw("END")
      CaseExpr(branches.toList, els)
    }

    private def parseReturnItems(): List[SelectItem] = {
      val items = collection.mutable.ListBuffer[SelectItem]()
      // default names must be unique per item list, or two unaliased
      // expressions collide on "expr" (duplicate output columns,
      // ambiguous ORDER BY)
      val defaultsUsed = collection.mutable.Set[String]()
      def freshDefault(base: String): String = {
        val name = if (!defaultsUsed(base)) base
        else Iterator.from(1).map(i => s"$base$i").find(!defaultsUsed(_)).get
        defaultsUsed += name
        name
      }
      var more = true
      while (more) {
        cur match {
          case Ident(f) if aggFns(f.toUpperCase) && nxt == Sym("(") =>
            val fn = f.toUpperCase
            pos += 2
            val distinct = if (isKw(cur, "DISTINCT")) { pos += 1; true } else false
            val arg = cur match {
              case Sym("*") => pos += 1; None
              case _ => Some(propRef())
            }
            if (distinct && arg.isEmpty)
              throw new AdtParseException(s"$fn(DISTINCT *) is not valid")
            if ((fn == "COLLECT" || fn.startsWith("STDEV") ||
                fn.startsWith("PERCENTILE")) && arg.isEmpty)
              throw new AdtParseException(s"${fn.toLowerCase}(*) is not valid")
            // percentileCont/percentileDisc carry the quantile as a second
            // literal argument
            val param = if (fn.startsWith("PERCENTILE")) {
              expectSym(",")
              literal() match {
                case NumLit(q, _) if q >= 0 && q <= 1 => Some(q)
                case other => throw new AdtParseException(
                  s"$fn quantile must be a literal in [0, 1], got $other")
              }
            } else None
            expectSym(")")
            val as = if (isKw(cur, "AS")) { pos += 1; Some(ident()) } else None
            items += SelectAgg(fn, arg, as, distinct, param)
          case _ =>
            val e = valueExpr()
            val as = if (isKw(cur, "AS")) { pos += 1; Some(ident()) } else None
            items += (e match {
              case PropRef(None, List(a)) if as.isEmpty => SelectEntity(a)
              // length(p): default output name "length", not the
              // __length pseudo-property
              case PropRef(ent, List("__length")) =>
                SelectProp(ent, List("__length"), as.orElse(Some("length")))
              case PropRef(ent, path) => SelectProp(ent, path, as)
              case f: FnCall =>
                SelectExpr(f, as.orElse(Some(freshDefault(f.name.toLowerCase))))
              case other => SelectExpr(other, as.orElse(Some(freshDefault("expr"))))
            })
        }
        if (cur == Sym(",")) pos += 1 else more = false
      }
      items.toList
    }

    /** alias, alias.prop, alias.`$x`.`$y`, alias['$x']['$y'] chains. */
    private def propRef(): PropRef = {
      val first = ident()
      val path = collection.mutable.ListBuffer[String]()
      var more = true
      while (more) {
        cur match {
          case Sym(".") => pos += 1; path += ident()
          case Sym("[") if nxt.isInstanceOf[Str] =>
            pos += 1
            path += (advance() match { case Str(s) => s; case _ => "" })
            expectSym("]")
          case _ => more = false
        }
      }
      if (path.isEmpty) PropRef(None, List(first)) else PropRef(Some(first), path.toList)
    }

    // ---- WHERE grammar: OR < AND < NOT < predicates ----

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
      if (isKw(cur, "NOT")) { pos += 1; Not(notExpr()) } else predicate()

    private def predicate(): Expr = {
      if (cur == Sym("(")) {
        // grouped boolean (`(a OR b) AND c`) or a parenthesized value
        // expression heading a comparison (`(t.x + 1) * 2 > 3`): parse the
        // group, then continue into a comparison suffix if one follows
        pos += 1
        enterParen()
        val e = orExpr()
        parenDepth -= 1
        expectSym(")")
        return cmpSuffix(cur match {
          case Sym("*" | "/" | "%" | "+") => arithTail(e)
          case Sym("-") => arithTail(e)
          case _ => e
        })
      }
      // label(r) = 'name'
      if (isKw(cur, "label") && nxt == Sym("(")) {
        pos += 2
        val relAlias = ident()
        expectSym(")")
        expectSym("=")
        val v = literal()
        return Cmp("=", PropRef(Some(relAlias), List("$relationshipName")), v)
      }
      // EXISTS((a)-[:r]->(b)) pattern predicate (negation via NOT in front),
      // or the legacy property form exists(n.prop) = IS NOT NULL
      if (isKw(cur, "EXISTS") && nxt == Sym("(")) {
        pos += 2
        if (cur != Sym("(")) {
          val ref = propRef()
          expectSym(")")
          return FnCall("IS_DEFINED", List(ref))
        }
        val before = propFilters.size
        var left = parseNode()
        val edge = cur match {
          case Sym("-") =>
            pos += 1
            val (relAlias, relNames, vle) = parseRelBody()
            expectSym("->")
            val right = parseNode()
            MatchEdge(left, relAlias, relNames, right, vle)
          case Sym("<-") =>
            pos += 1
            val (relAlias, relNames, vle) = parseRelBody()
            expectSym("-")
            val right = parseNode()
            MatchEdge(right, relAlias, relNames, left, vle)
          case t => throw new AdtParseException(s"expected edge pattern in EXISTS, found $t")
        }
        expectSym(")")
        // inline property maps scope to the EXISTS pattern itself (they
        // constrain the existential match, not the outer rows) — carry
        // them on the edge; the planner folds them into the probe scan
        val mapFilters = propFilters.drop(before).toList
        propFilters.remove(before, propFilters.size - before)
        // VLE inside EXISTS plans as a reachability-pair probe (the same
        // Vle.range expansion a MATCH VLE uses) + the standard semi/anti
        // join — lifted in r16; see AdtPlanner.existsProbe
        return ExistsPattern(edge.copy(optWhere = mapFilters.reduceOption(And)))
      }
      // any/all/none/single(x IN src WHERE p) list predicates — desugared
      // at parse into SIZE over the equivalent list comprehension, so the
      // planner sees only shapes it already compiles (openCypher 9 §4.2
      // quantifier semantics over the comprehension's kept elements)
      cur match {
        case Ident(f) if listPredFns(f.toUpperCase) && nxt == Sym("(") =>
          return parseListPredicate(f.toUpperCase)
        case _ =>
      }
      // [graphname.]is_of_model(alias, 'model' | graphname.model_and_descendants('m'))
      // — the AGE function surface (docs/concepts/querying.mdx:33,
      // QueryTests.cs:1342,1601; is_of_model_old is the legacy alias)
      val isOfModelAt =
        if (isKw(cur, "is_of_model") || isKw(cur, "is_of_model_old")) Some(0)
        else (cur, nxt) match {
          case (Ident(_), Sym(".")) if isKw(toks(pos + 2), "is_of_model") ||
            isKw(toks(pos + 2), "is_of_model_old") => Some(2)
          case _ => None
        }
      isOfModelAt match {
        case Some(off) if toks(pos + off + 1) == Sym("(") =>
          pos += off + 2
          val alias = ident()
          expectSym(",")
          val modelId = cur match {
            case Str(s) => pos += 1; s
            case Ident(_) =>
              // graphname.model_and_descendants('m') — closure arg form
              ident(); expectSym("."); expectKw("model_and_descendants")
              expectSym("("); val m = advance() match {
                case Str(s) => s
                case t => throw new AdtParseException(s"expected model id string, found $t")
              }; expectSym(")")
              m
            case t => throw new AdtParseException(s"bad is_of_model argument $t")
          }
          expectSym(")")
          return FnCall("IS_OF_MODEL", List(PropRef(None, List(alias)), StrLit(modelId)))
        case _ =>
      }
      cmpSuffix(valueExpr())
    }

    /** Continue arithmetic after an already-parsed left operand (used when
      * a parenthesized group turns out to head a value expression). */
    private def arithTail(l0: Expr): Expr = {
      var l = l0
      var more = true
      while (more) cur match {
        case Sym(op @ ("*" | "/" | "%")) => pos += 1; l = Arith(op, l, unaryExpr())
        case Sym(op @ ("+" | "-")) => pos += 1; l = Arith(op, l, mulExpr())
        case _ => more = false
      }
      l
    }

    /** The comparison/predicate operators that may follow a value
      * expression; absent any, the expression itself is the predicate. */
    private def cmpSuffix(l: Expr): Expr = cur match {
      case Sym("=") => pos += 1; Cmp("=", l, valueExpr())
      case Sym("<") if nxt == Sym(">") => pos += 2; Cmp("!=", l, valueExpr())
      case Sym(op @ ("!=" | "<" | ">" | "<=" | ">=")) =>
        pos += 1; Cmp(op, l, valueExpr())
      case Ident(s) if s.equalsIgnoreCase("IN") =>
        pos += 1
        if (cur != Sym("[")) {
          // `'tag1' IN t.tags` — membership in a LIST PROPERTY, which is
          // exactly ARRAY_CONTAINS(t.tags, 'tag1') (the ADT spelling)
          val arr = propRef()
          l match {
            case lit: Lit => FnCall("ARRAY_CONTAINS", List(arr, lit))
            case other => throw new AdtParseException(
              s"IN over a list property needs a literal left operand, got $other")
          }
        } else {
          expectSym("[")
          val vals = collection.mutable.ListBuffer[Lit]()
          var more = cur != Sym("]")
          while (more) {
            vals += literal()
            if (cur == Sym(",")) pos += 1 else more = false
          }
          expectSym("]")
          In(l, vals.toList)
        }
      case Ident(s) if s.equalsIgnoreCase("STARTS") =>
        pos += 1; expectKw("WITH"); FnCall("STARTSWITH", List(l, literal()))
      case Ident(s) if s.equalsIgnoreCase("ENDS") =>
        pos += 1; expectKw("WITH"); FnCall("ENDSWITH", List(l, literal()))
      case Ident(s) if s.equalsIgnoreCase("CONTAINS") =>
        pos += 1; FnCall("CONTAINS", List(l, literal()))
      case Ident(s) if s.equalsIgnoreCase("IS") =>
        pos += 1
        if (isKw(cur, "NOT")) { pos += 1; expectKw("NULL"); FnCall("IS_DEFINED", List(l)) }
        else { expectKw("NULL"); FnCall("IS_NULL", List(l)) }
      case _ => l
    }

    private def literal(): Lit = advance() match {
      case Str(s) => StrLit(s)
      case Num(s) => NumLit(s.toDouble, !s.contains('.'))
      case Ident(s) if s.equalsIgnoreCase("true") => BoolLit(true)
      case Ident(s) if s.equalsIgnoreCase("false") => BoolLit(false)
      case t => throw new AdtParseException(s"expected literal, found $t")
    }
  }
}

/** Language detection — AgeDigitalTwinsClient.Query.cs:44-55: contains
  * SELECT and no RETURN ⇒ ADT; otherwise raw Cypher. */
object QueryLanguage {
  def detect(q: String): String = {
    val u = q.toUpperCase
    if (u.contains("SELECT") && !u.contains("RETURN")) "adt" else "cypher"
  }

  def parse(q: String): AdtQuery =
    if (detect(q) == "adt") AdtParser.parse(q) else CypherParser.parse(q)
}
