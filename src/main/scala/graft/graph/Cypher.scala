package graft.graph

/** Cypher-subset AST + parser (SURVEY §2.8; reference parser at
  * /root/reference/cypher.py:3-278, golden shapes in cypher_test.py; edge
  * direction bookkeeping at /root/reference/client.py:805-816, RETURN of
  * node attribute values at client.py:1201-1219).
  *
  * Grammar (case-insensitive keywords, as the reference):
  * {{{
  *   stmt    := MATCH chains (OPTIONAL MATCH chains)*
  *                [WHERE wexpr] RETURN ret (, ret)*
  *                [ORDER BY ret [ASC|DESC] (, ...)*] [LIMIT n]
  *            |  MATCH chains [WHERE wexpr] WITH witem (, witem)*
  *                [WHERE bexpr] (MATCH segment… | RETURN ret (, ret)*)
  *              // WITH pipeline (growth): witem := ret [AS ident]; the
  *              // post-WITH bexpr compares BARE output names (the graph
  *              // HAVING); segments chain — see the With scaladoc.
  *            |  MATCH chains [WHERE ...] DETACH DELETE var (, var)*
  *            |  MATCH chains [WHERE ...] SET var.attr = 'v' (, ...)*
  *              // OPTIONAL MATCH / DETACH DELETE / SET (growth — the
  *              // reference grammar is MATCH/MERGE only): see the Stmt
  *              // scaladocs for the outer-join / cascade / upsert
  *              // semantics each carries.
  *            |  MERGE chains
  *              // ORDER BY / LIMIT (growth, like HashQL's): sort keys
  *              // address RETURN items (var or var.attr — a properties()
  *              // map is unorderable and rejected); ORDER BY + LIMIT
  *              // plans TakeOrderedAndProject — per-partition top-k +
  *              // driver merge, no global sort at any scale.
  *   wexpr   := wconj (OR wconj)* ; wconj := watom (AND watom)*
  *   watom   := '(' wexpr ')' | NOT watom | cond
  *   cond    := var.attr (= | < | > | <= | >=) ('v' | n)
  *              // WHERE (growth — the reference's grammar has no WHERE,
  *              // cypher.py): inequality/range predicates over node or
  *              // edge attributes with full boolean structure (AND over
  *              // OR, parens, three-valued NOT — HashQL's rules).
  *              // A numeric literal compares numerically (the attr string
  *              // casts to long — HashQL's coercion rule); a quoted
  *              // literal compares as a string. var.name addresses the
  *              // node identity itself.
  *   chains  := chain (, chain)*
  *   chain   := node (edge node)*
  *   edge    := -[relpat]->  |  <-[relpat]-  |  -[relpat]-
  *   relpat  := [var] :REL hops [{k: 'v', ...}]   // edge PROPERTIES
  *              // (growth beyond the reference, whose edges are bare
  *              // adjacency bits — client.py:805-816): MERGE stores the
  *              // map (existing edge's attrs win on re-merge, like node
  *              // identity), MATCH filters on it, RETURN addresses it
  *              // via the edge variable (e.attr → column e_attr;
  *              // properties(e) → the whole map as e_properties)
  *   hops    := ε  |  *n  |  *m..n        // variable-length (growth): ε = 1
  *   // *m..n uses WALK semantics (vertices/edges may repeat along a
  *   // path), not Neo4j's relationship-uniqueness (trail) semantics:
  *   // with an undirected rel, (x)-[:R*2]-(y) includes (x, x) by
  *   // traversing the same edge out and back — pairs Neo4j would
  *   // exclude. Porting Neo4j queries: undirected bands over-report
  *   // endpoint pairs (directed bands agree on acyclic graphs).
  *   node    := ( [var] [:Label] [{k: 'v', ...}] )   // keys may be quoted
  *   ret     := var [. attr]  |  properties(var)      // n | n.name | whole map
  *            |  count(*) | count(var[.attr])         // aggregates (growth):
  *            |  (sum|avg|min|max)(var.attr)          // implicit grouping by
  *              // the plain items, Cypher-style; aggregation ranges over
  *              // the DISTINCT pattern bindings (see RetAgg); numeric
  *              // aggs coerce attrs via try_cast-to-long
  * }}}
  * The IR mirrors the reference's `parser.graph` element list (node dicts +
  * relationship dicts) regrouped into chains.
  */
object Cypher {

  sealed trait Dir
  case object Out extends Dir   // (a)-[:R]->(b)
  case object In extends Dir    // (a)<-[:R]-(b)
  case object Both extends Dir  // (a)-[:R]-(b)

  final case class NodePat(variable: Option[String], label: Option[String],
                           attrs: Map[String, String])
  /** minHops/maxHops: 1/1 for a plain edge; `*m..n` sets the range
    * (growth beyond the reference — endpoint reachability within the hop
    * band, one relationship type per band). `variable` binds the edge for
    * attribute RETURNs (single-hop only); `attrs` filters on (MATCH) or
    * stores (MERGE) edge properties — on a `*m..n` band every traversed
    * edge must carry the attrs. */
  final case class Rel(typ: String, dir: Dir,
                       minHops: Int = 1, maxHops: Int = 1,
                       variable: Option[String] = None,
                       attrs: Map[String, String] = Map.empty) {
    require(minHops >= 1 && minHops <= maxHops,
      s"bad hop range *$minHops..$maxHops")
    require(maxHops <= 8, s"hop range capped at 8, got $maxHops")
    require(variable.isEmpty || (minHops == 1 && maxHops == 1),
      "an edge variable cannot bind a *m..n band")
  }
  final case class Chain(nodes: Seq[NodePat], rels: Seq[Rel]) {
    require(nodes.length == rels.length + 1, "malformed chain")
  }
  /** A RETURN-list entry: a plain item ([[Ret]]) or an aggregate call
    * ([[RetAgg]] — growth; the reference's RETURN is projection-only). */
  sealed trait RetItem
  /** RETURN item: the bound node (attr = None), one of its attribute
    * values (attr = Some; "name" addresses the node identity itself), or
    * the node's WHOLE attribute map (`properties(n)` — attr = Some("*"),
    * the reference's RETURN-of-node-dicts, client.py:1201-1219). */
  final case class Ret(variable: String, attr: Option[String]) extends RetItem
  /** Aggregate RETURN item (growth): `count(*)` (arg None), `count(v)` /
    * `count(v.attr)`, or `sum|avg|min|max(v.attr)`. Cypher's implicit
    * grouping applies — the plain items alongside become the grouping
    * keys; no plain items → one global row. Aggregation ranges over the
    * DISTINCT variable bindings of the pattern (anonymous endpoints
    * included) — the set semantics RETURN already has, lifted to groups.
    * Numeric aggregates coerce the attr with try_cast-to-long (HashQL's
    * rule): non-numeric or missing attrs drop from the aggregate as
    * NULLs rather than throwing mid-scan. */
  final case class RetAgg(fn: String, arg: Option[Ret]) extends RetItem {
    // in a PATTERN return, sum/avg/min/max additionally need a var.attr
    // argument (a bare node identity is a string) — validated in
    // evalMatch, because in a WITH pipeline segment the same bare form
    // legitimately addresses a numeric piped column (`sum(n)`).
    // `collect(v[.attr])` (round-11 growth) gathers the group's DISTINCT
    // values into a SORTED list — set semantics like the rest of this
    // surface (Neo4j's bag collect keeps duplicates — documented
    // divergence, same family as RETURN's always-distinct), sorted so
    // the list is deterministic across partitionings. The natural
    // producer for a downstream pipeline UNWIND ([[UnwindCol]]).
    require(fn == "count" || arg.isDefined, s"$fn needs an argument")
    require(arg.forall(!_.attr.contains("*")),
      "cannot aggregate a properties(...) map")
  }
  /** Boolean WHERE structure (growth — Neo4j's full AND/OR/NOT/parens
    * surface over the comparison leaves): standard precedence, AND binds
    * tighter than OR. `wheres` on a statement is the TOP-LEVEL conjunct
    * list (an element may internally be an OR/NOT tree), so the flat
    * AND-chain shape round 5 shipped is unchanged as the common case. */
  sealed trait WExpr
  final case class WAnd(l: WExpr, r: WExpr) extends WExpr
  final case class WOr(l: WExpr, r: WExpr) extends WExpr
  /** Three-valued like HashQL's NOT: negating a NULL comparison stays
    * NULL, so the row still drops — ANSI semantics. */
  final case class WNot(e: WExpr) extends WExpr
  /** WHERE comparison leaf: `variable.attr op value`. `value` is Long
    * for a numeric literal (numeric comparison — the attr casts to long,
    * HashQL's coercion rule) or String for a quoted one; `attr` "name" on
    * a node variable addresses the identity itself. attr == "" marks a
    * BARE output-column reference — constructed only by the post-WITH
    * WHERE parser, where WITH has narrowed scope to its output names. */
  final case class Where(variable: String, attr: String, op: String,
                         value: Any) extends WExpr

  /** Every comparison leaf under a WHERE tree — validation and
    * attr-carry planning range over these. */
  def leaves(e: WExpr): Seq[Where] = e match {
    case w: Where => Seq(w)
    case WAnd(l, r) => leaves(l) ++ leaves(r)
    case WOr(l, r) => leaves(l) ++ leaves(r)
    case WNot(x) => leaves(x)
  }
  sealed trait Stmt
  /** `optional` chains (growth — `OPTIONAL MATCH`, absent from the
    * reference grammar) left-join onto the mandatory pattern's bindings:
    * unmatched rows keep the mandatory columns and NULL the
    * optional-only variables — Cypher's outer-pattern semantics. The
    * optional group must share ≥1 variable with the mandatory group, and
    * WHERE conjuncts may reference mandatory bindings only (Neo4j scopes
    * a WHERE after OPTIONAL MATCH to the optional pattern; that filter
    * belongs in the optional pattern's attr maps here). */
  final case class Match(chains: Seq[Chain], returns: Seq[RetItem],
                         wheres: Seq[WExpr] = Nil,
                         orderBy: Seq[(RetItem, Boolean)] = Nil,
                         limit: Option[Int] = None,
                         optional: Seq[Chain] = Nil) extends Stmt
  final case class Merge(chain: Chain) extends Stmt
  /** `MATCH … [WHERE …] DETACH DELETE v (, v)*` (growth): drop every node
    * bound to a listed variable in any pattern match, cascading to ALL
    * incident edges (the DETACH contract; bare DELETE-with-edges-present
    * is an error in Cypher and is not offered here). */
  final case class Delete(chains: Seq[Chain], wheres: Seq[WExpr],
                          vars: Seq[String]) extends Stmt
  /** `MATCH … [WHERE …] SET v.attr = 'val' (, v.attr = 'val')*` (growth):
    * upsert one attribute on every node bound to `v` — last write wins
    * within a statement's set list, the identity attribute `name` is not
    * settable. */
  final case class SetAttrs(chains: Seq[Chain], wheres: Seq[WExpr],
                            sets: Seq[(String, String, String)]) extends Stmt
  /** `MATCH p = shortestPath((a …)-[:R*m..n]-(b …)) RETURN …` (growth —
    * Neo4j's anchored shortest-path form; the reference grammar has
    * neither): minimum hop count from a UNIQUELY-bound source `a` to
    * every target matching `b`'s label/attrs within the band, walk
    * semantics, BFS-evaluated ([[PropertyGraph.bfsDistances]] — frontier
    * joins, never vertices×edges). RETURN items: the target variable,
    * `target.attr`, or `length(p)` (column `<p>_length`); `length(p)`
    * parses into Ret(pathVar, Some("length")) — unambiguous because the
    * path variable shadows nothing. Directions: `->` follows src→dst,
    * `-` either way; `<-` is rejected (write the flipped pattern).
    * `*m..n` defaults to `*1..8`; min > 0 keeps the source itself out
    * unless the band admits length 0 paths (it cannot — minHops ≥ 1). */
  final case class ShortestPathStmt(pathVar: String, chain: Chain,
                                    returns: Seq[Ret]) extends Stmt {
    require(chain.nodes.length == 2 && chain.rels.length == 1,
      "shortestPath takes a single (a)-[...]-(b) pattern")
    require(chain.rels.head.dir != In,
      "shortestPath: <- direction unsupported — flip the pattern")
  }
  /** `MATCH … [WHERE …] WITH item (, item)* [WHERE …] (MATCH … | RETURN …)`
    * — the WITH pipeline (growth; neither the reference grammar nor round-6's
    * dialect had multi-stage queries). Each WITH closes one pattern stage:
    * its items (plain vars / var.attr / aggregates, optionally `AS`-aliased)
    * become the ONLY names in scope downstream — Neo4j's scoping rule. A
    * WHERE after WITH filters those output columns (the graph HAVING:
    * `WITH n, count(*) AS c WHERE c > 2`); its comparison leaves are BARE
    * output names ([[Where]] with attr == "", constructed only here) — to
    * filter on `n.attr` downstream, project it in the WITH first. `next` is
    * the rest of the pipeline: another MATCH segment (whose patterns re-bind
    * shared WITH variables — possibly itself ending in WITH, so stages
    * chain), or a bare RETURN (a [[Match]] with EMPTY chains — valid only
    * as a pipeline tail, projecting the piped frame). */
  final case class With(chains: Seq[Chain], optional: Seq[Chain],
                        wheres: Seq[WExpr],
                        items: Seq[(RetItem, Option[String])],
                        postWheres: Seq[WExpr],
                        next: Stmt,
                        orderBy: Seq[(String, Boolean)] = Nil,
                        limit: Option[Int] = None) extends Stmt {
    require(items.nonEmpty, "WITH needs at least one item")
    // `WITH … ORDER BY … LIMIT … WHERE …` — Neo4j's clause order and
    // semantics: the sort + truncation shape the stage's OUTPUT (the
    // top-k pipeline idiom), THEN the WHERE filters what survived. Sort
    // keys are bare output names, (name, desc) pairs.
  }

  /** `UNWIND ['v1', 'v2', …] AS x (MATCH segment… | RETURN …)` (round-10
    * growth — Neo4j's list-expansion clause over a LITERAL list): the
    * list becomes a one-column frame named `x`, piped into the tail
    * exactly like a WITH stage's output — a MATCH tail re-binding `x` as
    * a node variable anchors its pattern on the listed identities (the
    * "look these ids up" idiom), a bare RETURN projects the list.
    * Values must be all-string or all-numeric (one column, one type).
    * Set semantics like the rest of this surface: RETURN dedups, so a
    * duplicated list element yields one row (Neo4j's bag UNWIND keeps
    * it — documented divergence, same as RETURN DISTINCT-always). */
  final case class Unwind(values: Seq[Any], alias: String, next: Stmt) extends Stmt {
    require(values.nonEmpty, "UNWIND needs a non-empty literal list")
    require(values.forall(_.isInstanceOf[Long]) ||
        values.forall(_.isInstanceOf[String]),
      "UNWIND list must be all-string or all-numeric")
  }

  /** `… WITH collect(x) AS xs … UNWIND xs AS x (MATCH … | RETURN …)`
    * (round-11 growth — UNWIND over a PIPED column, the re-expansion half
    * of collect): inside a pipeline, UNWIND names a list-typed column of
    * the piped frame and explodes it under `alias`; every other piped
    * variable stays in scope (Neo4j's rule). The statement-head UNWIND
    * keeps its literal-list form ([[Unwind]]). */
  final case class UnwindCol(column: String, alias: String, next: Stmt) extends Stmt

  def parse(input: String): Stmt = {
    val p = new P(input)
    val out = p.stmt()
    p.expectEof()
    out
  }

  private final class P(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    private def peek: Char = if (i < s.length) s(i) else '\u0000'
    private def eat(c: Char): Unit = {
      ws(); require(peek == c, s"expected '$c' at $i in: $s"); i += 1
    }
    private def tryEat(c: Char): Boolean = { ws(); if (peek == c) { i += 1; true } else false }
    private def ident(): String = {
      ws(); val start = i
      while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
      require(i > start, s"expected identifier at $start in: $s")
      s.substring(start, i)
    }
    private def keyword(): String = { ws(); ident().toLowerCase }
    private def quoted(): String = {
      ws(); require(peek == '\'', s"expected quote at $i"); i += 1
      val start = i
      while (i < s.length && s(i) != '\'') i += 1
      val v = s.substring(start, i); i += 1; v
    }
    private def int(): Int = {
      ws(); val start = i
      while (i < s.length && s(i).isDigit) i += 1
      require(i > start, s"expected integer at $start in: $s")
      s.substring(start, i).toInt
    }
    /** Consume `k` (case-insensitive) if it is the next identifier;
      * otherwise leave the position untouched. */
    private def tryKeyword(k: String): Boolean = {
      ws(); val save = i
      if (i < s.length && s(i).isLetter && ident().equalsIgnoreCase(k)) true
      else { i = save; false }
    }
    /** A statement must consume the whole input — trailing junk is an
      * error, never silently ignored (same contract as HashQL). */
    def expectEof(): Unit = {
      ws()
      require(i >= s.length,
        s"unexpected trailing input at $i: ${s.substring(i).take(24)}")
    }

    def stmt(): Stmt = keyword() match {
      case "match" if { ws(); peek != '(' } =>
        // `MATCH p = shortestPath( chain )` — the only MATCH form that
        // does not open with a node's '('
        val pv = ident()
        eat('=')
        require(keyword() == "shortestpath", "expected shortestPath after '='")
        eat('(')
        val c = chain()
        eat(')')
        require(keyword() == "return", "shortestPath expects RETURN")
        def spItem(): Ret = {
          val save = i
          if (tryKeyword("length") && tryEat('(')) {
            val v = ident(); eat(')')
            require(v == pv, s"unknown path variable $v")
            Ret(pv, Some("length"))
          } else {
            i = save
            val v = ident()
            if (tryEat('.')) Ret(v, Some(ident())) else Ret(v, None)
          }
        }
        val spRets = scala.collection.mutable.ArrayBuffer(spItem())
        while (tryEat(',')) spRets += spItem()
        ShortestPathStmt(pv, c, spRets.toSeq)
      case "match" => matchRest()
      case "merge" => Merge(chains().head)
      case "unwind" =>
        eat('[')
        val vals = scala.collection.mutable.ArrayBuffer.empty[Any]
        ws()
        if (peek != ']') {
          var m = true
          while (m) {
            ws()
            vals += (if (peek == '\'') quoted() else int().toLong)
            m = tryEat(',')
          }
        }
        eat(']')
        require(tryKeyword("as"), "expected AS after the UNWIND list")
        val alias = ident()
        val tail = keyword() match {
          case "match" => matchRest() match {
            case t @ (_: Match | _: With) => t
            case _ => throw new IllegalArgumentException(
              "an UNWIND MATCH tail must end in WITH or RETURN")
          }
          case "return" => returnTail(Nil, Nil, Nil)
          case o => throw new IllegalArgumentException(
            s"expected MATCH or RETURN after UNWIND … AS, got: $o")
        }
        Unwind(vals.toSeq, alias, tail)
      case k => throw new IllegalArgumentException(s"unsupported cypher statement: $k")
    }

    /** top-level ANDs flatten into the statement's conjunct list;
      * OR/NOT/parens stay as trees inside an element */
    private def topConjuncts(e: WExpr): Seq[WExpr] = e match {
      case WAnd(l, r) => topConjuncts(l) ++ topConjuncts(r)
      case x => Seq(x)
    }

    /** Everything after a consumed MATCH keyword (pattern form) — also the
      * recursive entry for pipeline segments after WITH. */
    private def matchRest(): Stmt = {
        val cs = chains()
        // OPTIONAL MATCH groups (growth): each adds chains to the
        // left-joined optional pattern
        val opt = scala.collection.mutable.ArrayBuffer.empty[Chain]
        while (tryKeyword("optional")) {
          require(keyword() == "match", "expected MATCH after OPTIONAL")
          opt ++= chains()
        }
        var k = keyword()
        val conds = scala.collection.mutable.ArrayBuffer.empty[WExpr]
        if (k == "where") {
          conds ++= topConjuncts(whereExpr(patternLeaf))
          k = keyword()
        }
        k match {
          case "return" => returnTail(cs, conds.toSeq, opt.toSeq)
          case "with" =>
            // WITH pipeline (growth): items close this stage; an optional
            // WHERE filters the stage's OUTPUT columns by bare name (the
            // graph HAVING); the tail is another MATCH segment or a bare
            // RETURN over the piped frame. A leading DISTINCT is accepted
            // and a no-op — stage outputs already have set semantics.
            tryKeyword("distinct")
            val items = scala.collection.mutable.ArrayBuffer.empty[(RetItem, Option[String])]
            var m = true
            while (m) {
              val it = retItem()
              val alias = if (tryKeyword("as")) Some(ident()) else None
              require(!PartialFunction.cond(it) {
                case Ret(_, Some("*")) => true },
                "WITH cannot pipe a properties(...) map — project attrs instead")
              items += ((it, alias))
              m = tryEat(',')
            }
            // ORDER BY / LIMIT before WHERE — Neo4j's WITH-modifier
            // order; sort keys are bare output names
            val obs = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
            if (tryKeyword("order")) {
              require(keyword() == "by", "expected BY after ORDER")
              var more = true
              while (more) {
                val n = ident()
                val desc = if (tryKeyword("desc")) true else { tryKeyword("asc"); false }
                obs += ((n, desc))
                more = tryEat(',')
              }
            }
            val lim = if (tryKeyword("limit")) Some(int()) else None
            val post =
              if (tryKeyword("where")) topConjuncts(whereExpr(bareLeaf)) else Nil
            val tail = keyword() match {
              case "match" => matchRest() match {
                case t @ (_: Match | _: With) => t
                case _ => throw new IllegalArgumentException(
                  "a pipeline MATCH segment must end in WITH or RETURN")
              }
              case "return" => returnTail(Nil, Nil, Nil) // bare RETURN tail
              // `UNWIND xs AS x` over a piped column (round-11): the
              // bare-identifier form, distinct from the statement-head
              // literal-list UNWIND
              case "unwind" =>
                val column = ident()
                require(tryKeyword("as"), "expected AS after UNWIND column")
                val ualias = ident()
                val utail = keyword() match {
                  case "match" => matchRest() match {
                    case t @ (_: Match | _: With) => t
                    case _ => throw new IllegalArgumentException(
                      "an UNWIND MATCH tail must end in WITH or RETURN")
                  }
                  case "return" => returnTail(Nil, Nil, Nil)
                  case o => throw new IllegalArgumentException(
                    s"expected MATCH or RETURN after UNWIND … AS, got: $o")
                }
                UnwindCol(column, ualias, utail)
              case o => throw new IllegalArgumentException(
                s"expected MATCH, RETURN, or UNWIND after WITH, got: $o")
            }
            With(cs, opt.toSeq, conds.toSeq, items.toSeq, post, tail,
              obs.toSeq, lim)
          case "detach" =>
            require(opt.isEmpty, "DETACH DELETE cannot follow OPTIONAL MATCH")
            require(keyword() == "delete", "expected DELETE after DETACH")
            val vs = scala.collection.mutable.ArrayBuffer(ident())
            while (tryEat(',')) vs += ident()
            Delete(cs, conds.toSeq, vs.toSeq)
          case "set" =>
            require(opt.isEmpty, "SET cannot follow OPTIONAL MATCH")
            val sets = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
            var m = true
            while (m) {
              val v = ident(); eat('.'); val a = ident()
              eat('='); sets += ((v, a, quoted()))
              m = tryEat(',')
            }
            SetAttrs(cs, conds.toSeq, sets.toSeq)
          case other => throw new IllegalArgumentException(
            s"expected RETURN, WITH, DETACH DELETE, or SET, got: $other")
        }
    }

    /** RETURN list + ORDER BY/LIMIT → a [[Match]]; shared by the plain
      * statement form and the pipeline tail (where `cs` is empty).
      * A leading DISTINCT is accepted and a no-op — RETURN already has
      * set semantics here (Neo4j-port compatibility). */
    private def returnTail(cs: Seq[Chain], conds: Seq[WExpr],
                           opt: Seq[Chain]): Match = {
            tryKeyword("distinct")
            val rets = scala.collection.mutable.ArrayBuffer(retItem())
            while (tryEat(',')) rets += retItem()
            val obs = scala.collection.mutable.ArrayBuffer.empty[(RetItem, Boolean)]
            if (tryKeyword("order")) {
              require(keyword() == "by", "expected BY after ORDER")
              var m = true
              while (m) {
                val r = retItem()
                require(!PartialFunction.cond(r) {
                  case Ret(_, Some("*")) => true },
                  "cannot ORDER BY a properties(...) map")
                val desc = if (tryKeyword("desc")) true else { tryKeyword("asc"); false }
                obs += ((r, desc))
                m = tryEat(',')
              }
            }
            val lim = if (tryKeyword("limit")) Some(int()) else None
            Match(cs, rets.toSeq, conds, obs.toSeq, lim, opt)
    }

    /** WHERE grammar, standard precedence: expr := conj (OR conj)*;
      * conj := atom (AND atom)*; atom := '(' expr ')' | NOT atom | leaf.
      * `tryKeyword` consumes whole identifiers, so OR never swallows the
      * start of ORDER. The leaf parser is a parameter: pattern WHEREs
      * compare `var.attr`; post-WITH WHEREs compare bare output names. */
    private def whereExpr(leaf: () => WExpr): WExpr = {
      var e = whereConj(leaf)
      while (tryKeyword("or")) e = WOr(e, whereConj(leaf))
      e
    }
    private def whereConj(leaf: () => WExpr): WExpr = {
      var e = whereAtom(leaf)
      while (tryKeyword("and")) e = WAnd(e, whereAtom(leaf))
      e
    }
    private def whereAtom(leaf: () => WExpr): WExpr = {
      ws()
      if (tryEat('(')) { val e = whereExpr(leaf); eat(')'); e }
      else if (tryKeyword("not")) WNot(whereAtom(leaf))
      else leaf()
    }
    /** pattern-WHERE leaf: `var.attr op value` */
    private val patternLeaf: () => WExpr = () => {
      val v = ident(); eat('.'); val a = ident()
      Where(v, a, operator(), cmpValue())
    }
    /** post-WITH leaf: `name op value` — WITH narrows scope to its output
      * columns, so the reference is a BARE name (attr == "" marks it);
      * a dotted ref here gets a targeted error instead of a parse death. */
    private val bareLeaf: () => WExpr = () => {
      val v = ident()
      ws()
      require(peek != '.',
        s"WHERE after WITH references output columns by bare name ('$v'); " +
          "project the attribute in the WITH items first")
      Where(v, "", operator(), cmpValue())
    }
    private def cmpValue(): Any = { ws()
      if (peek == '\'') quoted() else int().toLong }

    /** WHERE comparison operator; `<>` dies with a clear unsupported-op
      * error (same courtesy as HashQL's lexer) rather than mis-parsing. */
    private def operator(): String = {
      ws()
      val two = if (i + 1 < s.length) s.substring(i, i + 2) else ""
      if (two == "<=" || two == ">=") { i += 2; two }
      else if (two == "<>") throw new IllegalArgumentException(
        s"unsupported where op <> at $i in: $s")
      else peek match {
        case c @ ('=' | '<' | '>') => i += 1; c.toString
        case c => throw new IllegalArgumentException(
          s"unsupported where op at $i: $c in: $s")
      }
    }

    private def ret(): Ret = {
      val v = ident()
      if (v.equalsIgnoreCase("properties") && { ws(); peek == '(' }) {
        eat('('); val inner = ident(); eat(')')
        Ret(inner, Some("*")) // whole attribute map
      }
      else if (tryEat('.')) Ret(v, Some(ident())) else Ret(v, None)
    }

    /** RETURN entry: `count(*)` / `count(v[.attr])` /
      * `sum|avg|min|max(v.attr)` (an aggregate keyword IMMEDIATELY
      * followed by '(' — a node variable with one of these names still
      * parses bare), properties(v), or var[.attr]. */
    private def retItem(): RetItem = {
      ws(); val save = i
      val v = ident()
      if (Seq("count", "sum", "avg", "min", "max", "collect").contains(v.toLowerCase)
          && { ws(); peek == '(' }) {
        eat('(')
        val arg = { ws(); if (peek == '*') { i += 1; None } else Some(ret()) }
        eat(')')
        RetAgg(v.toLowerCase, arg)
      } else { i = save; ret() }
    }

    private def chains(): Seq[Chain] = {
      val out = scala.collection.mutable.ArrayBuffer(chain())
      while ({ ws(); peek == ',' && lookaheadChain() }) { i += 1; out += chain() }
      out.toSeq
    }
    // a ',' continues the chain list only if followed by '('
    private def lookaheadChain(): Boolean = {
      var j = i + 1
      while (j < s.length && s(j).isWhitespace) j += 1
      j < s.length && s(j) == '('
    }

    private def chain(): Chain = {
      val nodes = scala.collection.mutable.ArrayBuffer(node())
      val rels = scala.collection.mutable.ArrayBuffer.empty[Rel]
      while ({ ws(); peek == '-' || peek == '<' }) {
        val reversed = tryEat('<')
        eat('-'); eat('[')
        ws()
        val evar = if (peek != ':') Some(ident()) else None
        eat(':'); val typ = ident()
        val (mn, mx) =
          if (tryEat('*')) {
            val lo = int()
            if (tryEat('.')) { eat('.'); (lo, int()) } else (lo, lo)
          } else (1, 1)
        val eattrs = attrMap()
        eat(']'); eat('-')
        val forward = tryEat('>')
        require(!(reversed && forward), s"edge cannot be both <- and -> in: $s")
        rels += Rel(typ,
          if (reversed) In else if (forward) Out else Both, mn, mx, evar, eattrs)
        nodes += node()
      }
      Chain(nodes.toSeq, rels.toSeq)
    }

    /** `{k: 'v', ...}` (keys may be quoted) — shared by node and edge
      * patterns; empty map when no brace follows. */
    private def attrMap(): Map[String, String] = {
      val attrs = scala.collection.mutable.LinkedHashMap.empty[String, String]
      if (tryEat('{')) {
        while ({ ws(); peek != '}' }) {
          ws()
          val k = if (peek == '\'') quoted() else ident()
          eat(':')
          attrs += k -> quoted()
          tryEat(',')
        }
        eat('}')
      }
      attrs.toMap
    }

    private def node(): NodePat = {
      eat('(')
      ws()
      var variable: Option[String] = None
      var label: Option[String] = None
      if (peek != ':' && peek != '{' && peek != ')') variable = Some(ident())
      if (tryEat(':')) label = Some(ident())
      val attrs = attrMap()
      eat(')')
      NodePat(variable, label, attrs)
    }
  }
}
