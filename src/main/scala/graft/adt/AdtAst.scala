package graft.adt

/** AST for the ADT query language (the surface the reference translates to
  * Cypher via regex in
  * /root/reference/src/AgeDigitalTwins/AdtQueryHelpers.cs:11-250; we parse
  * to a real AST and plan straight to DataFrames — no Cypher intermediary).
  *
  * Grammar covered (verified against the 41 golden cases in
  * /root/reference/src/AgeDigitalTwins.Test/AdtQueryToCypherTests.cs):
  *
  *   SELECT [TOP(n)] items FROM (DIGITALTWINS|RELATIONSHIPS) [alias]
  *     [MATCH (a)-[r:l1|l2]->(b)[-[r2:l]->(c)]... | chained <-[r]- reverse]
  *     [JOIN tgt RELATED src.relName [relAlias]]...
  *     [WHERE expr]
  */
/** The planner's internal anonymous-alias namespace, shared by the parse-
  * time reservation check and the plan-time RETURN-* filter so the two
  * stay in lockstep. Internal shapes are exactly `__cnode<n>` (anonymous
  * pattern nodes), `__rel<n>` / `__srel<n>_<m>` (un-aliased
  * relationships), and `__srelmap<n>` (anonymous-rel property maps) — a
  * digit always follows the prefix, so previously-legal user identifiers
  * like `__related` or `__srelevant` are NOT reserved. */
object InternalAlias {
  private val Shape = "__(?:cnode|srelmap|srel|rel)\\d.*".r
  def is(s: String): Boolean = Shape.pattern.matcher(s).matches()
}

sealed trait SelectItem
case object SelectStar extends SelectItem
case object SelectCount extends SelectItem
final case class SelectEntity(alias: String) extends SelectItem
final case class SelectProp(entity: Option[String], path: List[String],
    as: Option[String]) extends SelectItem
/** Aggregate return item (Cypher `RETURN k, count(*) / sum(x) / avg(x) /
  * min(x) / max(x) / collect(x)`, optionally `fn(DISTINCT x)`):
  * non-aggregate items become grouping keys. `collect` gathers the grouped
  * values into a list (sorted — openCypher leaves the order unspecified,
  * we pick the deterministic one). */
final case class SelectAgg(fn: String, arg: Option[PropRef],
    as: Option[String], distinct: Boolean = false,
    // percentileCont/percentileDisc second argument (the quantile)
    param: Option[Double] = None) extends SelectItem
/** Scalar-expression return item (Cypher `RETURN toUpper(n.name) AS x`,
  * size()/coalesce()/toString()/toLower() over bindings) — compiled as a
  * plain Column, grouped-by when the RETURN also aggregates. */
final case class SelectExpr(e: Expr, as: Option[String]) extends SelectItem

sealed trait FromSource
final case class FromTwins(alias: Option[String]) extends FromSource
final case class FromRelationships(alias: Option[String]) extends FromSource
/** Pipeline-only Cypher query (`UNWIND [...] AS x RETURN x`): the scope
  * starts as a single empty row, not a table scan. */
case object FromUnit extends FromSource

/** One edge in a MATCH pattern chain, always normalized to forward
  * direction (src)-[rel]->(dst); `<-[r]-` inputs are flipped at parse.
  * `vle` carries variable-length bounds for `[*min..max]` edges.
  * `optional` marks OPTIONAL MATCH edges (planned as left-outer joins —
  * unmatched sources keep a row with null rel/target columns). */
final case class MatchEdge(src: String, relAlias: Option[String],
    relNames: List[String], dst: String, vle: Option[(Int, Int)] = None,
    optional: Boolean = false, pathAlias: Option[String] = None,
    // false when the source pattern used a reverse arrow (`<-[r]-`): src/dst
    // are normalized to edge direction, so path-order accessors (nodes(p))
    // must flip them back
    pathForward: Boolean = true,
    // `OPTIONAL MATCH ... WHERE expr` (and inline property maps of the
    // optional pattern): scoped to the pattern, planned INTO the left-outer
    // join condition — a failing predicate null-extends instead of
    // dropping the outer row
    optWhere: Option[Expr] = None,
    // `p = shortestPath(...)` vs a bare `p = (a)-[*..]->(b)`: shortestPath
    // binds one row per endpoint PAIR (minimal depth); a bare VLE path
    // binds one row per PATH, with interiors enumerated
    shortest: Boolean = false)

/** JOIN tgt RELATED src.relName relAlias (AdtQueryHelpers.cs:127-159). */
final case class JoinRelated(target: String, source: String, relName: String,
    relAlias: Option[String])

sealed trait Expr
final case class And(l: Expr, r: Expr) extends Expr
final case class Or(l: Expr, r: Expr) extends Expr
final case class Not(e: Expr) extends Expr
/** op ∈ = != < > <= >= */
final case class Cmp(op: String, l: Expr, r: Expr) extends Expr
final case class In(l: Expr, values: List[Lit]) extends Expr
final case class PropRef(entity: Option[String], path: List[String]) extends Expr
final case class FnCall(name: String, args: List[Expr]) extends Expr
/** Cypher list literal `[1, 2, 3]` — the UNWIND source form. */
final case class ListLit(values: List[Lit]) extends Expr
/** Cypher `EXISTS((a)-[:r]->(b))` pattern predicate — planned as a
  * semi-join (anti-join under NOT) against the relationship table, so it
  * never fans out rows. Must appear as a top-level WHERE conjunct. */
final case class ExistsPattern(edge: MatchEdge) extends Expr
/** Arithmetic over property refs / literals / nested expressions;
  * op ∈ + - * / %. Numeric semantics: JSON-extracted operands are cast to
  * double (agtype arithmetic in the reference promotes the same way). */
final case class Arith(op: String, l: Expr, r: Expr) extends Expr
/** Generic-form CASE: ordered (condition, result) branches + optional
  * ELSE. The simple form `CASE x WHEN v THEN ...` is desugared at parse
  * into equality conditions, so the planner sees only this shape. */
final case class CaseExpr(branches: List[(Expr, Expr)],
    elseExpr: Option[Expr]) extends Expr
/** Cypher list comprehension `[x IN src WHERE pred | out]` — both the
  * filter and the projection are optional (`[x IN src WHERE p]`,
  * `[x IN src | e]`, `[x IN src]` are all valid). Compiles to the
  * higher-order array functions filter/transform (codegen'd, row-local). */
final case class ListComp(varName: String, src: Expr, where: Option[Expr],
    out: Option[Expr]) extends Expr
/** Cypher `reduce(acc = init, x IN src | expr)` — compiles to the
  * higher-order aggregate() array fold. */
final case class ReduceExpr(accName: String, init: Expr, varName: String,
    src: Expr, out: Expr) extends Expr
sealed trait Lit extends Expr
final case class StrLit(v: String) extends Lit
final case class NumLit(v: Double, isInt: Boolean) extends Lit
final case class BoolLit(v: Boolean) extends Lit

/** Cypher pipeline clauses between MATCH and RETURN, applied in order. */
sealed trait PipeClause
/** `WITH [DISTINCT] items [ORDER BY ...] [SKIP n] [LIMIT n] [WHERE expr]`
  * — projection/aggregation stage; retained entity aliases keep their
  * bindings, other items become flat named columns (the Cypher horizon).
  * Per openCypher, ORDER BY → SKIP → LIMIT apply to the horizon first and
  * WHERE filters the surviving rows. A sorted+limited horizon plans as
  * top-k (TakeOrdered), not a full sort. */
final case class WithClause(items: List[SelectItem], where: Option[Expr],
    distinct: Boolean = false,
    orderBy: List[(Expr, Boolean)] = Nil,
    skip: Option[Int] = None, limit: Option[Int] = None) extends PipeClause
/** `UNWIND src AS alias` — src is a [[ListLit]] or a [[PropRef]] to a JSON
  * array property / flat list column. */
final case class UnwindClause(src: Expr, alias: String) extends PipeClause
/** `MATCH pattern [WHERE expr]` AFTER a WITH horizon: extends the scope
  * with new hops/bindings (sources already in scope join on their dt_id;
  * fresh bindings enter as cartesian factors, the openCypher semantics).
  * `where` includes any inline property-map equalities of this stage. */
final case class MatchClause(edges: List[MatchEdge], loneNodes: List[String],
    where: Option[Expr]) extends PipeClause

final case class AdtQuery(
    top: Option[Int],
    items: List[SelectItem],
    from: FromSource,
    matches: List[MatchEdge],
    joins: List[JoinRelated],
    where: Option[Expr],
    skip: Option[Int] = None,               // Cypher SKIP (paging rewrite target)
    orderBy: List[(Expr, Boolean)] = Nil, // (expr, ascending)
    distinct: Boolean = false,
    pipeline: List[PipeClause] = Nil,        // Cypher WITH / UNWIND stages
    loneNodes: List[String] = Nil,           // Cypher `MATCH (a), (b)` bare bindings
    nodeLabels: Map[String, String] = Map.empty) // alias -> node label as written
                                            // (`:Model` routes to the model graph)
