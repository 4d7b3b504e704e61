package graft.parser

import graft.ast._
import Tokenizer._

/** Recursive-descent parser for the PG-flavored dialect.
  *
  * Grammar follows the reference's combinator grammar (reference
  * src/framequery/parser/_parser.py:234-565; precedence chain surveyed in
  * SURVEY.md §2.9) with the deliberate extensions SURVEY §7.2 lists:
  * HAVING, window frames, set operations, IN value-lists, BETWEEN,
  * EXISTS/IN subqueries, FULL/CROSS join keywords.
  */
final class Parser(tokens: Vector[Token],
    extraAggs: Set[String] = Set.empty) {
  private var pos = 0

  private def peek: Option[Token] = if (pos < tokens.length) Some(tokens(pos)) else None
  private def peekAt(k: Int): Option[Token] =
    if (pos + k < tokens.length) Some(tokens(pos + k)) else None
  private def next(): Token = {
    val t = tokens(pos); pos += 1; t
  }
  private def fail(msg: String): Nothing = {
    val ctx = tokens.slice(math.max(0, pos - 2), pos + 3).map(_.value).mkString(" ")
    throw new ParseException(s"$msg near '$ctx' (token ${pos})")
  }
  private def isKw(t: Token, kw: String): Boolean =
    t.kind == TIdent && t.lower == kw
  private def peekKw(kw: String): Boolean = peek.exists(isKw(_, kw))
  private def peekKwAt(k: Int, kw: String): Boolean = peekAt(k).exists(isKw(_, kw))
  private def acceptKw(kw: String): Boolean =
    if (peekKw(kw)) { pos += 1; true } else false
  private def expectKw(kw: String): Unit =
    if (!acceptKw(kw)) fail(s"expected '$kw'")
  private def peekOp(op: String): Boolean =
    peek.exists(t => t.kind == TOp && t.value == op)
  private def acceptOp(op: String): Boolean =
    if (peekOp(op)) { pos += 1; true } else false
  private def expectOp(op: String): Unit =
    if (!acceptOp(op)) fail(s"expected '$op'")

  private val reserved = Set(
    "select", "from", "where", "group", "having", "order", "limit", "offset",
    "join", "inner", "left", "right", "full", "outer", "cross", "on", "as",
    "and", "or", "not", "in", "like", "between", "is", "null", "true", "false",
    "case", "when", "then", "else", "end", "cast", "distinct", "all", "union",
    "intersect", "except", "by", "asc", "desc", "with", "lateral", "exists",
    "copy", "create", "drop", "show", "using", "nulls", "natural")

  private val aggFunctions = Set(
    "avg", "max", "min", "sum", "count", "every", "any_value",
    "stddev_pop", "stddev_samp", "stddev", "var_pop", "var_samp", "variance",
    "bool_and", "bool_or", "collect", "collect_list", "collect_set",
    "first_value_agg", "median", "mode", "corr", "covar_pop", "covar_samp",
    "approx_count_distinct", "string_agg", "array_agg")

  private val windowOnlyFunctions = Set(
    "row_number", "rank", "dense_rank", "percent_rank", "ntile", "cume_dist",
    "lag", "lead", "first_value", "last_value", "nth_value")

  // ------------------------------------------------------------- entry points
  def parseStatement(): Statement = {
    val stmt =
      if (peekKw("copy")) parseCopy()
      else if (peekKw("drop")) parseDrop()
      else if (peekKw("create")) parseCreate()
      else if (peekKw("show")) parseShow()
      else if (peekKw("explain")) {
        next()
        val analyze = acceptKw("analyze")
        ExplainStmt(parseSelect(), analyze)
      }
      else if (peekKw("insert")) parseInsert()
      else if (peekKw("delete")) parseDelete()
      else if (peekKw("update")) parseUpdate()
      else if (peekKw("truncate")) parseTruncate()
      else if (peekKw("merge")) parseMerge()
      else if (peekKw("analyze")) parseAnalyze()
      else if (peekKw("optimize")) parseOptimize()
      else if (peekKw("alter")) parseAlter()
      else parseSelect()
    acceptOp(";")
    if (pos < tokens.length) fail("trailing tokens")
    stmt
  }

  // ------------------------------------------------------------- statements
  private def parseIdent(): String = peek match {
    case Some(t) if t.kind == TQuotedIdent => next(); t.value
    case Some(t) if t.kind == TIdent && !reserved(t.lower) => next(); t.value
    case _ => fail("expected identifier")
  }

  private def parseAlter(): Statement = {
    expectKw("alter"); expectKw("table")
    val t = parseIdent()
    expectKw("add")
    val cname = if (acceptKw("constraint")) Some(parseIdent()) else None
    def colList(): Seq[String] = {
      expectOp("(")
      var cols = Seq(parseIdent())
      while (acceptOp(",")) cols :+= parseIdent()
      expectOp(")")
      cols
    }
    if (acceptKw("primary")) {
      expectKw("key")
      AlterAddPrimaryKey(t, cname, colList())
    } else {
      expectKw("foreign"); expectKw("key")
      val cols = colList()
      expectKw("references")
      val ref = parseIdent()
      AlterAddForeignKey(t, cname, cols, ref, colList())
    }
  }

  private def parseCopy(): Statement = {
    expectKw("copy")
    val table = parseIdent()
    val isFrom =
      if (acceptKw("from")) true
      else if (acceptKw("to")) false
      else fail("expected FROM or TO")
    val path = peek match {
      case Some(t) if t.kind == TString => next(); t.value
      case _ => fail("expected path string")
    }
    val options =
      if (acceptKw("with")) parseOptionList() else Map.empty[String, String]
    if (isFrom) CopyFrom(table, path, options) else CopyTo(table, path, options)
  }

  /** `name [=] value, ...` — optionally parenthesized; values are
    * strings or bare identifiers. Shared by COPY (reference style:
    * `WITH format 'csv'`) and CREATE TABLE (`WITH (persist='parquet')`). */
  private def parseOptionList(): Map[String, String] = {
    var options = Map.empty[String, String]
    val paren = acceptOp("(")
    var done = false
    while (!done) {
      val name = parseIdent().toLowerCase
      acceptOp("=")
      val value = peek match {
        case Some(t) if t.kind == TString => next(); t.value
        case Some(t) if t.kind == TIdent => next(); t.value
        case _ => fail("expected option value")
      }
      options += (name -> value)
      done = !acceptOp(",")
    }
    if (paren) expectOp(")")
    options
  }

  private def parseInsert(): Statement = {
    expectKw("insert"); expectKw("into")
    val table = parseIdent()
    var cols = Seq.empty[String]
    if (peekOp("(")) {
      next()
      cols :+= parseIdent()
      while (acceptOp(",")) cols :+= parseIdent()
      expectOp(")")
    }
    val q =
      if (peekKw("values")) {
        next()
        var rows = Seq.empty[Seq[Expr]]
        do {
          expectOp("(")
          var row = Seq.empty[Expr]
          row :+= parseExpr()
          while (acceptOp(",")) row :+= parseExpr()
          expectOp(")")
          rows :+= row
        } while (acceptOp(","))
        Select(items = Seq(Wildcard(None)),
          from = Seq(ValuesRel(rows, Some("__v"), cols)))
      } else parseSelect()
    InsertInto(table, cols, q)
  }

  private def parseDelete(): Statement = {
    expectKw("delete"); expectKw("from")
    val table = parseIdent()
    val using = if (acceptKw("using")) Some(parseRelation()) else None
    val where = if (acceptKw("where")) Some(parseExpr()) else None
    DeleteFrom(table, where, using)
  }

  private def parseUpdate(): Statement = {
    expectKw("update")
    val table = parseIdent()
    expectKw("set")
    var sets = Seq.empty[(String, Expr)]
    var done = false
    while (!done) {
      val c = parseIdent()
      expectOp("=")
      sets :+= (c -> parseExpr())
      done = !acceptOp(",")
    }
    val from = if (acceptKw("from")) Some(parseRelation()) else None
    val where = if (acceptKw("where")) Some(parseExpr()) else None
    UpdateStmt(table, sets, where, from)
  }

  private def parseTruncate(): Statement = {
    expectKw("truncate"); acceptKw("table")
    TruncateStmt(parseIdent())
  }

  private def parseMerge(): Statement = {
    expectKw("merge"); expectKw("into")
    val table = parseIdent()
    val tAlias =
      if (acceptKw("as")) Some(parseIdent())
      else peek match {
        case Some(t) if t.kind == TIdent && !reserved(t.lower) &&
            t.lower != "using" => next(); Some(t.value)
        case _ => None
      }
    expectKw("using")
    val source = parseRelation()
    expectKw("on")
    val on = parseExpr()
    var clauses = Seq.empty[MergeClause]
    while (peekKw("when")) {
      next()
      val matched = !acceptKw("not")
      expectKw("matched")
      val cond = if (acceptKw("and")) Some(parseExpr()) else None
      expectKw("then")
      if (acceptKw("update")) {
        if (!matched) fail("WHEN NOT MATCHED cannot UPDATE")
        expectKw("set")
        var sets = Seq.empty[(String, Expr)]
        var done = false
        while (!done) {
          val c = parseIdent()
          expectOp("=")
          sets :+= (c -> parseExpr())
          done = !acceptOp(",")
        }
        clauses :+= MergeClause(matched, cond, "update", sets = sets)
      } else if (acceptKw("delete")) {
        if (!matched) fail("WHEN NOT MATCHED cannot DELETE")
        clauses :+= MergeClause(matched, cond, "delete")
      } else if (acceptKw("insert")) {
        if (matched) fail("WHEN MATCHED cannot INSERT")
        var cols = Seq.empty[String]
        if (peekOp("(")) {
          next()
          cols :+= parseIdent()
          while (acceptOp(",")) cols :+= parseIdent()
          expectOp(")")
        }
        expectKw("values"); expectOp("(")
        var vals = Seq(parseExpr())
        while (acceptOp(",")) vals :+= parseExpr()
        expectOp(")")
        clauses :+= MergeClause(matched, cond, "insert",
          insertCols = cols, insertVals = vals)
      } else fail("expected UPDATE, DELETE or INSERT after THEN")
    }
    if (clauses.isEmpty) fail("MERGE needs at least one WHEN clause")
    MergeStmt(table, tAlias, source, on, clauses)
  }

  private def parseAnalyze(): Statement = {
    expectKw("analyze"); acceptKw("table")
    // bare ANALYZE (no table list) means the whole scope, like PG
    val isIdent = peek.exists(t =>
      t.kind == TQuotedIdent || (t.kind == TIdent && !reserved(t.lower)))
    if (!isIdent) AnalyzeStmt(Nil)
    else {
      var names = Seq(parseIdent())
      while (acceptOp(",")) names :+= parseIdent()
      AnalyzeStmt(names)
    }
  }

  private def parseOptimize(): Statement = {
    expectKw("optimize"); acceptKw("table")
    val table = parseIdent()
    val zcols =
      if (acceptKw("zorder")) {
        expectKw("by")
        val paren = acceptOp("(")
        var cols = Seq(parseIdent())
        while (acceptOp(",")) cols :+= parseIdent()
        if (paren) expectOp(")")
        cols
      } else Nil
    val options =
      if (acceptKw("with")) parseOptionList() else Map.empty[String, String]
    OptimizeStmt(table, zcols, options)
  }

  private def parseDrop(): Statement = {
    expectKw("drop")
    // DROP VIEW is the same scope unbind as DROP TABLE (views ARE lazy
    // scope entries here)
    if (!acceptKw("table")) expectKw("view")
    var names = Seq(parseIdent())
    while (acceptOp(",")) names :+= parseIdent()
    DropTable(names)
  }

  private def parseCreate(): Statement = {
    expectKw("create")
    // CREATE [OR REPLACE] VIEW v AS select — sugar for the lazy CTAS
    // (an un-persisted CTAS already IS a view: the plan re-evaluates on
    // use); OR REPLACE is the scope rebind both forms do anyway
    if (peekKw("or") || peekKw("view")) {
      if (acceptKw("or")) { expectKw("replace"); expectKw("view") }
      else expectKw("view")
      val name = parseIdent()
      expectKw("as")
      return CreateTableAs(name, parseSelect(), Map.empty)
    }
    expectKw("table")
    val name = parseIdent()
    val options =
      if (acceptKw("with")) parseOptionList() else Map.empty[String, String]
    expectKw("as")
    CreateTableAs(name, parseSelect(), options)
  }

  private def parseShow(): Statement = {
    expectKw("show")
    val rest = new StringBuilder
    while (pos < tokens.length && !peekOp(";")) {
      if (rest.nonEmpty) rest.append(' ')
      rest.append(next().lower)
    }
    ShowStmt(rest.toString)
  }

  // ----------------------------------------------------------------- select
  def parseSelect(): Select = {
    var cteRecursive = false
    var cteCols = Map.empty[String, Seq[String]]
    val cte =
      if (acceptKw("with")) {
        cteRecursive = acceptKw("recursive")
        var entries = Seq.empty[(String, Select)]
        var done = false
        while (!done) {
          val name = parseIdent()
          // optional declared column list: WITH t(n, path) AS (...)
          if (acceptOp("(")) {
            var cols = Seq(parseIdent())
            while (acceptOp(",")) cols :+= parseIdent()
            expectOp(")")
            cteCols += (name -> cols)
          }
          expectKw("as"); expectOp("(")
          val sub = parseSelect()
          expectOp(")")
          entries :+= (name -> sub)
          done = !acceptOp(",")
        }
        entries
      } else Nil

    var sel = parseCoreSelect().copy(cte = cte, cteRecursive = cteRecursive,
      cteCols = cteCols)

    // set operations chain
    var setOps = Seq.empty[(String, Select)]
    var going = true
    while (going) {
      if (acceptKw("union")) {
        val op = if (acceptKw("all")) "union all" else "union"
        setOps :+= (op -> parseCoreSelect())
      } else if (acceptKw("intersect")) {
        val op = if (acceptKw("all")) "intersect all" else "intersect"
        setOps :+= (op -> parseCoreSelect())
      } else if (acceptKw("except")) {
        val op = if (acceptKw("all")) "except all" else "except"
        setOps :+= (op -> parseCoreSelect())
      }
      else going = false
    }
    if (setOps.nonEmpty) sel = sel.copy(setOps = setOps)

    // trailing order/limit/offset apply to the full (set-op) result
    val ob = parseOrderByOpt()
    if (ob.nonEmpty) sel = sel.copy(orderBy = ob)
    parseLimitOffset() match {
      case (l, o) =>
        if (l.isDefined) sel = sel.copy(limit = l)
        if (o.isDefined) sel = sel.copy(offset = o)
    }
    sel
  }

  private def parseCoreSelect(): Select = {
    expectKw("select")
    var distinctOn = Seq.empty[Expr]
    val distinct =
      if (acceptKw("distinct")) {
        if (acceptKw("on")) {
          expectOp("(")
          distinctOn :+= parseExpr()
          while (acceptOp(",")) distinctOn :+= parseExpr()
          expectOp(")")
          false
        } else true
      } else { acceptKw("all"); false }
    var items = Seq(parseSelectItem())
    while (acceptOp(",")) items :+= parseSelectItem()

    val from =
      if (acceptKw("from")) {
        var rels = Seq(parseJoinChain())
        while (acceptOp(",")) rels :+= parseJoinChain()
        rels
      } else Nil

    val where = if (acceptKw("where")) Some(parseExpr()) else None

    var groupType = "simple"
    var groupingSets = Seq.empty[Seq[Expr]]
    val groupBy =
      if (peekKw("group")) {
        expectKw("group"); expectKw("by")
        if (peekKw("rollup") || peekKw("cube")) {
          groupType = next().lower
          expectOp("(")
          var es = Seq(parseExpr())
          while (acceptOp(",")) es :+= parseExpr()
          expectOp(")")
          es
        } else if (peekKw("grouping") && peekKwAt(1, "sets")) {
          next(); next()
          groupType = "sets"
          expectOp("(")
          // each element: `(a, b)` / `()` / bare expr (= singleton set)
          def parseSet(): Seq[Expr] =
            if (acceptOp("(")) {
              if (acceptOp(")")) Nil
              else {
                var es = Seq(parseExpr())
                while (acceptOp(",")) es :+= parseExpr()
                expectOp(")")
                es
              }
            } else Seq(parseExpr())
          groupingSets = Seq(parseSet())
          while (acceptOp(",")) groupingSets :+= parseSet()
          expectOp(")")
          // union of all set members, in first-appearance order
          groupingSets.flatten.foldLeft(Seq.empty[Expr]) {
            (acc, e) => if (acc.contains(e)) acc else acc :+ e
          }
        } else if (acceptKw("all")) {
          // GROUP BY ALL (DuckDB/Spark convenience): group by every
          // non-aggregate select item — desugared to ordinals here so
          // the compiler's existing ordinal resolution does the rest
          items.zipWithIndex.collect {
            case (ExprItem(e, _), i) if !containsSetFn(e) => IntLit(i + 1)
          }
        } else {
          var es = Seq(parseExpr())
          while (acceptOp(",")) es :+= parseExpr()
          es
        }
      } else Nil

    val having = if (acceptKw("having")) Some(parseExpr()) else None
    // PG WINDOW clause: named specs referenced by `fn() OVER w`
    var windows = Map.empty[String, WindowDef]
    if (acceptKw("window")) {
      var going = true
      while (going) {
        val name = parseIdent()
        expectKw("as"); expectOp("(")
        windows += (name -> parseWindowSpecBody())
        expectOp(")")
        going = acceptOp(",")
      }
    }
    val qualify = if (acceptKw("qualify")) Some(parseExpr()) else None
    Select(qualify = qualify,
      distinct = distinct, distinctOn = distinctOn, items = items,
      from = from, where = where, groupBy = groupBy, groupType = groupType,
      groupingSets = groupingSets, having = having, windows = windows)
  }

  private def parseOrderByOpt(): Seq[SortItem] =
    if (peekKw("order")) {
      expectKw("order"); expectKw("by")
      var is = Seq(parseSortItem())
      while (acceptOp(",")) is :+= parseSortItem()
      is
    } else Nil

  private def parseSortItem(): SortItem = {
    val e = parseExpr()
    val asc =
      if (acceptKw("desc")) false
      else { acceptKw("asc"); true } // SQL-standard default ASC (SURVEY §2.6 decision)
    val nf =
      if (acceptKw("nulls")) {
        if (acceptKw("first")) Some(true)
        else { expectKw("last"); Some(false) }
      } else None
    SortItem(e, asc, nf)
  }

  private def parseLimitOffset(): (Option[Long], Option[Long]) = {
    var limit: Option[Long] = None
    var offset: Option[Long] = None
    // PG allows LIMIT/OFFSET in either order; reference grammar is limit-first
    var going = true
    while (going) {
      if (peekKw("limit")) {
        expectKw("limit")
        if (acceptKw("all")) limit = None
        else limit = Some(parseNonNegInt())
      } else if (peekKw("offset")) {
        expectKw("offset")
        offset = Some(parseNonNegInt())
      } else going = false
    }
    (limit, offset)
  }

  private def parseNonNegInt(): Long = peek match {
    case Some(t) if t.kind == TInt => next(); t.value.toLong
    case _ => fail("expected integer")
  }

  private def parseSelectItem(): SelectItem = {
    if (peekOp("*")) { next(); return Wildcard(None) }
    // qualified wildcard: name(.name)*.*
    if (peek.exists(t => t.kind == TIdent || t.kind == TQuotedIdent)) {
      val save = pos
      val parts = scala.collection.mutable.ArrayBuffer[String]()
      var ok = !reserved(tokens(pos).lower) || tokens(pos).kind == TQuotedIdent
      if (ok) {
        parts += next().value
        var going = true
        while (going && peekOp(".")) {
          if (peekAt(1).exists(t => t.kind == TOp && t.value == "*")) {
            next(); next()
            return Wildcard(Some(parts.mkString(".")))
          } else if (peekAt(1).exists(t => t.kind == TIdent || t.kind == TQuotedIdent)) {
            next(); parts += next().value
          } else going = false
        }
      }
      pos = save
    }
    val e = parseExpr()
    val alias =
      if (acceptKw("as")) Some(parseIdent())
      else peek match {
        case Some(t) if (t.kind == TIdent && !reserved(t.lower)) || t.kind == TQuotedIdent =>
          next(); Some(t.value)
        case _ => None
      }
    ExprItem(e, alias)
  }

  // ------------------------------------------------------------------- FROM
  private def parseJoinChain(): Relation = {
    var left = parseRelation()
    var going = true
    while (going) {
      val save = pos
      var how: Option[String] = None
      var natural = false
      if (acceptKw("natural")) {
        // NATURAL [INNER|LEFT|RIGHT|FULL [OUTER]] JOIN — equi-join on all
        // shared column names (absent in the reference's grammar, §2.3)
        natural = true
        if (acceptKw("join")) how = Some("inner")
        else if (acceptKw("inner")) { expectKw("join"); how = Some("inner") }
        else if (acceptKw("left")) { acceptKw("outer"); expectKw("join"); how = Some("left") }
        else if (acceptKw("right")) { acceptKw("outer"); expectKw("join"); how = Some("right") }
        else if (acceptKw("full")) { acceptKw("outer"); expectKw("join"); how = Some("full") }
        else fail("expected JOIN after NATURAL")
      } else if (acceptKw("join")) how = Some("inner")
      else if (acceptKw("inner")) { expectKw("join"); how = Some("inner") }
      else if (peekKw("left")) {
        next(); acceptKw("outer"); expectKw("join"); how = Some("left")
      } else if (peekKw("right")) {
        next(); acceptKw("outer"); expectKw("join"); how = Some("right")
      } else if (peekKw("full")) {
        next(); acceptKw("outer"); expectKw("join"); how = Some("full")
      } else if (peekKw("cross")) { next(); expectKw("join"); how = Some("cross") }
      else if (peekKw("lateral")) {
        // implicit lateral join inside a chain: `a, lateral f(x) as b` is
        // handled at the comma level; `a join lateral ...` is non-standard
        pos = save; going = false
      }
      how match {
        case Some(h) if natural =>
          val right = parseRelation()
          // shared columns resolved at compile time (schema-dependent)
          left = JoinRel(h, left, right, Some(Call("__natural", Nil)))
        case Some(h) =>
          val right = parseRelation()
          if (h != "cross" && acceptKw("using")) {
            // USING (a, b) — equi-join on shared column names, marked by a
            // sentinel expression the compiler recognizes
            expectOp("(")
            var cols = Seq(parseIdent())
            while (acceptOp(",")) cols :+= parseIdent()
            expectOp(")")
            left = JoinRel(h, left, right,
              Some(Call("__using", cols.map(c => ColRef(Seq(c))))))
          } else {
            val on = if (h != "cross" && acceptKw("on")) Some(parseExpr()) else None
            left = JoinRel(h, left, right, on)
          }
        case None => going = false
      }
    }
    left
  }

  /** keywords that may follow a relation and therefore can't be an alias */
  private val relSuffixKws =
    Set("tablesample", "qualify", "pivot", "unpivot", "window")

  private def parseRelation(): Relation = {
    val lateral = acceptKw("lateral")
    if (peekOp("(")) {
      next()
      // VALUES relation: ( values (e, ...), (e, ...) ) as t(c1, ...)
      if (acceptKw("values")) {
        var rows = Seq.empty[Seq[Expr]]
        do {
          expectOp("(")
          var row = Seq.empty[Expr]
          row :+= parseExpr()
          while (acceptOp(",")) row :+= parseExpr()
          expectOp(")")
          rows :+= row
        } while (acceptOp(","))
        expectOp(")")
        acceptKw("as")
        val alias = peek match {
          case Some(t) if (t.kind == TIdent && !reserved(t.lower) &&
              !relSuffixKws(t.lower)) || t.kind == TQuotedIdent =>
            next(); Some(t.value)
          case _ => None
        }
        var cols = Seq.empty[String]
        if (alias.isDefined && acceptOp("(")) {
          cols :+= parseIdent()
          while (acceptOp(",")) cols :+= parseIdent()
          expectOp(")")
        }
        return parseSampleOpt(ValuesRel(rows, alias, cols))
      }
      val sub = parseSelect()
      expectOp(")")
      acceptKw("as")
      val alias = peek match {
        case Some(t) if (t.kind == TIdent && !reserved(t.lower) &&
            !relSuffixKws(t.lower)) || t.kind == TQuotedIdent =>
          next(); Some(t.value)
        case _ => None
      }
      return parseSampleOpt(SubqueryRel(sub, alias))
    }
    // table function? [schema.]ident followed by '('
    val qualifiedFn = peek.exists(t => t.kind == TIdent && !reserved(t.lower)) &&
      peekAt(1).exists(t => t.kind == TOp && t.value == ".") &&
      peekAt(2).exists(_.kind == TIdent) &&
      peekAt(3).exists(t => t.kind == TOp && t.value == "(")
    if (qualifiedFn ||
        (peek.exists(t => t.kind == TIdent && !reserved(t.lower)) &&
         peekAt(1).exists(t => t.kind == TOp && t.value == "("))) {
      if (qualifiedFn) { next(); next() } // drop the schema qualifier
      val fn = next().lower
      expectOp("(")
      var args = Seq.empty[Expr]
      if (!peekOp(")")) {
        args :+= parseExpr()
        while (acceptOp(",")) args :+= parseExpr()
      }
      expectOp(")")
      acceptKw("as")
      val alias = peek match {
        case Some(t) if (t.kind == TIdent && !reserved(t.lower) &&
            !relSuffixKws(t.lower)) || t.kind == TQuotedIdent =>
          next(); Some(t.value)
        case _ => None
      }
      // PG alias column list: `unnest(keys) s(attnum)`
      var aliasCols = Seq.empty[String]
      if (alias.isDefined && peekOp("(")) {
        next()
        aliasCols :+= parseIdent()
        while (acceptOp(",")) aliasCols :+= parseIdent()
        expectOp(")")
      }
      return parseSampleOpt(TableFunctionRel(fn, args, alias, lateral,
        aliasCols))
    }
    // plain table ref, possibly schema-qualified
    val first = parseIdent()
    val (schema, name) =
      if (peekOp(".") && peekAt(1).exists(t => t.kind == TIdent || t.kind == TQuotedIdent)) {
        next(); (Some(first), next().value)
      } else (None, first)
    acceptKw("as")
    val alias = peek match {
      case Some(t) if (t.kind == TIdent && !reserved(t.lower) &&
          !relSuffixKws(t.lower)) || t.kind == TQuotedIdent =>
        next(); Some(t.value)
      case _ => None
    }
    parseSampleOpt(TableRef(schema, name, alias))
  }

  /** optional relation suffixes, any order/number:
    * `TABLESAMPLE method(pct) [REPEATABLE(seed)]`, `PIVOT (...)`,
    * `UNPIVOT [INCLUDE|EXCLUDE NULLS] (...)` */
  private def parseSampleOpt(rel0: Relation): Relation = {
    var rel = rel0
    var going = true
    while (going) {
      if (acceptKw("tablesample")) {
        val method = parseIdent().toLowerCase
        expectOp("(")
        val pct = parseExpr() match {
          case IntLit(n) => n.toDouble
          case FloatLit(f) => f
          case _ => fail("TABLESAMPLE expects a numeric percentage")
        }
        expectOp(")")
        val seed =
          if (acceptKw("repeatable")) {
            expectOp("(")
            val s = parseExpr() match {
              case IntLit(n) => n
              case _ => fail("REPEATABLE expects an integer seed")
            }
            expectOp(")")
            Some(s)
          } else None
        rel = SampleRel(rel, method, pct, seed)
      } else if (acceptKw("pivot")) {
        expectOp("(")
        val agg = parseExpr()
        expectKw("for")
        val forCol = ColRef(Seq(parseIdent()))
        expectKw("in"); expectOp("(")
        var values = Seq.empty[(Expr, Option[String])]
        do {
          val v = parseExpr()
          val name = if (acceptKw("as")) Some(parseIdent()) else None
          values :+= (v -> name)
        } while (acceptOp(","))
        expectOp(")"); expectOp(")")
        rel = PivotRel(rel, agg, forCol, values)
      } else if (acceptKw("unpivot")) {
        val includeNulls =
          if (acceptKw("include")) { expectKw("nulls"); true }
          else { if (acceptKw("exclude")) expectKw("nulls"); false }
        expectOp("(")
        val valueCol = parseIdent()
        expectKw("for")
        val nameCol = parseIdent()
        expectKw("in"); expectOp("(")
        var cols = Seq.empty[(ColRef, Option[String])]
        do {
          val c = ColRef(Seq(parseIdent()))
          val label = if (acceptKw("as")) Some(next() match {
            case t if t.kind == TString => t.value
            case t if t.kind == TIdent || t.kind == TQuotedIdent => t.value
            case _ => fail("UNPIVOT label must be a string or identifier")
          }) else None
          cols :+= (c -> label)
        } while (acceptOp(","))
        expectOp(")"); expectOp(")")
        rel = UnpivotRel(rel, valueCol, nameCol, cols, includeNulls)
      } else going = false
    }
    rel
  }

  // ------------------------------------------------------------ expressions
  def parseExpr(): Expr = parseOr()

  private def parseOr(): Expr = {
    var e = parseAnd()
    while (acceptKw("or")) e = BinaryOp("or", e, parseAnd())
    e
  }

  private def parseAnd(): Expr = {
    var e = parseNot()
    while (acceptKw("and")) e = BinaryOp("and", e, parseNot())
    e
  }

  private def parseNot(): Expr =
    if (acceptKw("not")) UnaryOp("not", parseNot())
    else parsePredicate()

  /** comparisons, LIKE, IN, BETWEEN, IS NULL */
  private def parsePredicate(): Expr = {
    var e = parseBitShift()
    var going = true
    while (going) {
      if (peekOp("=") || peekOp("!=") || peekOp("<>") || peekOp("<") ||
          peekOp(">") || peekOp("<=") || peekOp(">=") ||
          peekOp("!>") || peekOp("!<")) {
        val op = next().value
        // `!>` (not greater) / `!<` (not less) — T-SQL-style sugar the
        // reference tokenizes but never maps (ref _parser.py:206); here
        // they execute as their ANSI equivalents
        val norm = op match {
          case "<>" => "!="
          case "!>" => "<="
          case "!<" => ">="
          case other => other
        }
        if ((peekKw("any") || peekKw("some") || peekKw("all")) &&
            peekAt(1).exists(t => t.kind == TOp && t.value == "(")) {
          val quant = next().lower
          expectOp("(")
          if (peekKw("select") || peekKw("with")) {
            val sub = parseSelect()
            expectOp(")")
            e = desugarQuantified(norm, e, sub, quant)
          } else {
            // PG array form: `x = ANY(array-expr)` / `x <> ALL(expr)` —
            // membership tests, compiled in the registry (__any_eq)
            val arr = parseExpr()
            expectOp(")")
            e = (norm, quant) match {
              case ("=", "any" | "some") => Call("__any_eq", Seq(arr, e))
              case ("!=", "all") =>
                UnaryOp("not", Call("__any_eq", Seq(arr, e)))
              case _ => fail(
                s"unsupported array quantifier: $norm ${quant.toUpperCase} " +
                  "(only = ANY and <> ALL)")
            }
          }
        } else e = BinaryOp(norm, e, parseBitShift())
      } else if (peekOp("~") || peekOp("~*") || peekOp("!~") || peekOp("!~*")) {
        // PG regex-match operators (binary position only; prefix `~`
        // stays bitwise NOT in parseUnary)
        val op = next().value
        e = BinaryOp(op, e, parseBitShift())
      } else if (peekKw("operator") &&
          peekAt(1).exists(t => t.kind == TOp && t.value == "(")) {
        // OPERATOR(schema.op) — explicit-schema operator syntax psql
        // emits; the schema qualifier carries no meaning here
        next(); next()
        if (peek.exists(t => t.kind == TIdent)) { next(); expectOp(".") }
        val op = peek match {
          case Some(t) if t.kind == TOp && t.value != ")" => next().value
          case _ => fail("expected operator name in OPERATOR()")
        }
        expectOp(")")
        val norm = op match { case "<>" => "!="; case other => other }
        e = BinaryOp(norm, e, parseBitShift())
      } else if (peekKw("like")) {
        next(); e = BinaryOp("like", e, parseBitShift())
      } else if (peekKw("ilike")) {
        next(); e = BinaryOp("ilike", e, parseBitShift())
      } else if (peekKw("similar") && peekKwAt(1, "to")) {
        next(); next(); e = Call("similar_to", Seq(e, parseBitShift()))
      } else if (peekKw("not") && peekKwAt(1, "similar") && peekKwAt(2, "to")) {
        next(); next(); next()
        e = UnaryOp("not", Call("similar_to", Seq(e, parseBitShift())))
      } else if (peekKw("not") && peekKwAt(1, "like")) {
        next(); next(); e = BinaryOp("not like", e, parseBitShift())
      } else if (peekKw("not") && peekKwAt(1, "ilike")) {
        next(); next(); e = BinaryOp("not ilike", e, parseBitShift())
      } else if (peekKw("not") && peekKwAt(1, "in")) {
        next(); next(); e = parseInTail(e, negated = true)
      } else if (peekKw("not") && peekKwAt(1, "between")) {
        next(); next(); e = parseBetweenTail(e, negated = true)
      } else if (peekKw("in")) {
        next(); e = parseInTail(e, negated = false)
      } else if (peekKw("between")) {
        next(); e = parseBetweenTail(e, negated = false)
      } else if (peekKw("is") && peekKwAt(1, "distinct")) {
        next(); next(); expectKw("from")
        e = UnaryOp("not", BinaryOp("<=>", e, parseBitShift()))
      } else if (peekKw("is") && peekKwAt(1, "not") && peekKwAt(2, "distinct")) {
        next(); next(); next(); expectKw("from")
        e = BinaryOp("<=>", e, parseBitShift())
      } else if (peekKw("is")) {
        next()
        val neg = acceptKw("not")
        if (acceptKw("null")) {
          e = if (neg) UnaryOp("is not null", e) else UnaryOp("is null", e)
        } else if (acceptKw("true")) {
          val base = BinaryOp("<=>", e, BoolLit(true))
          e = if (neg) UnaryOp("not", base) else base
        } else if (acceptKw("false")) {
          val base = BinaryOp("<=>", e, BoolLit(false))
          e = if (neg) UnaryOp("not", base) else base
        } else fail("expected NULL/TRUE/FALSE after IS")
      } else going = false
    }
    e
  }

  private def parseInTail(e: Expr, negated: Boolean): Expr = {
    expectOp("(")
    if (peekKw("select") || peekKw("with")) {
      val sub = parseSelect()
      expectOp(")")
      InSubquery(e, sub, negated)
    } else {
      var vs = Seq(parseExpr())
      while (acceptOp(",")) vs :+= parseExpr()
      expectOp(")")
      InList(e, vs, negated)
    }
  }

  private def parseBetweenTail(e: Expr, negated: Boolean): Expr = {
    val lo = parseBitShift()
    expectKw("and")
    val hi = parseBitShift()
    val in = BinaryOp("and", BinaryOp(">=", e, lo), BinaryOp("<=", e, hi))
    if (negated) UnaryOp("not", in) else in
  }

  /** `# << >>` (xor / shifts) */
  private def parseBitShift(): Expr = {
    var e = parseAddSub()
    var going = true
    while (going) {
      if (peekOp("#")) { next(); e = BinaryOp("#", e, parseAddSub()) }
      else if (peekOp("<<")) { next(); e = BinaryOp("<<", e, parseAddSub()) }
      else if (peekOp(">>")) { next(); e = BinaryOp(">>", e, parseAddSub()) }
      else going = false
    }
    e
  }

  /** `+ - & |` (reference groups bitwise and/or with additive level) */
  private def parseAddSub(): Expr = {
    var e = parseConcat()
    var going = true
    while (going) {
      if (peekOp("+")) { next(); e = BinaryOp("+", e, parseConcat()) }
      else if (peekOp("-")) { next(); e = BinaryOp("-", e, parseConcat()) }
      else if (peekOp("&")) { next(); e = BinaryOp("&", e, parseConcat()) }
      else if (peekOp("|")) { next(); e = BinaryOp("|", e, parseConcat()) }
      else going = false
    }
    e
  }

  private def parseConcat(): Expr = {
    var e = parseMulDiv()
    while (peekOp("||")) { next(); e = BinaryOp("||", e, parseMulDiv()) }
    e
  }

  private def parseMulDiv(): Expr = {
    var e = parseUnary()
    var going = true
    while (going) {
      if (peekOp("*")) { next(); e = BinaryOp("*", e, parseUnary()) }
      else if (peekOp("/")) { next(); e = BinaryOp("/", e, parseUnary()) }
      else if (peekOp("%")) { next(); e = BinaryOp("%", e, parseUnary()) }
      else going = false
    }
    e
  }

  /** PG precedence: `^` binds TIGHTER than unary minus (`-2 ^ 2` = -4),
    * and is right-associative with a possibly-signed right operand. */
  private def parseUnary(): Expr =
    if (acceptOp("-")) UnaryOp("-", parseUnary())
    else if (acceptOp("+")) parseUnary()
    else if (acceptOp("~")) UnaryOp("~", parseUnary())
    else parsePow()

  /** `^` is POWER in this dialect (not XOR — SURVEY §2.9). */
  private def parsePow(): Expr = {
    val e = parseCastPostfix()
    if (peekOp("^")) { next(); BinaryOp("^", e, parseUnary()) }
    else e
  }

  private def parseCastPostfix(): Expr = {
    var e = parseAtom()
    var going = true
    while (going) {
      if (acceptOp("::")) e = CastExpr(e, parseTypeName())
      else if (peekKw("collate")) {
        // COLLATE <qualified name>: the engine has one collation
        // (binary), so the clause is syntax-only — consumed, not applied
        next()
        if (peek.exists(t => t.kind == TIdent || t.kind == TQuotedIdent))
          next()
        else fail("expected collation name after COLLATE")
        while (peekOp(".") && peekAt(1).exists(t =>
            t.kind == TIdent || t.kind == TQuotedIdent)) { next(); next() }
      }
      else if (peekOp(".") && peekAt(1).exists(t =>
          t.kind == TIdent || t.kind == TQuotedIdent)) {
        // `(expr).field` composite access — name paths never reach here
        // (parseNameOrCall consumes their dots), so this only fires on
        // parenthesized/call results, PG record syntax
        next(); e = FieldAccess(e, next().value)
      }
      else if (acceptOp("[")) { // 1-based subscript (PG/DuckDB semantics)
        val idx = parseExpr()
        expectOp("]")
        // element_at requires an INT index; dialect ints are BIGINT.
        // PG returns NULL for indexes < 1 (element_at reads from the
        // END on negatives) and NULL past the end (try_element_at; the
        // plain form throws under ANSI) — guard the low side ourselves.
        val i = CastExpr(idx, "int")
        e = Call("if", Seq(BinaryOp(">=", i, IntLit(1)),
          Call("try_element_at", Seq(e, i)), NullLit))
      } else going = false
    }
    e
  }

  private def parseTypeName(): String = {
    var base = peek match {
      case Some(t) if t.kind == TIdent => next(); t.lower
      case _ => fail("expected type name")
    }
    // `pg_catalog.text`, `pg_catalog.regtype`, … — qualified type names
    // resolve by their base name
    while (peekOp(".") && peekAt(1).exists(_.kind == TIdent)) {
      next(); base = next().lower
    }
    val full = new StringBuilder(base)
    // multi-word types: double precision
    if (base == "double" && peekKw("precision")) { next(); full.clear(); full.append("double") }
    if (acceptOp("(")) {
      full.append('(').append(parseNonNegInt())
      while (acceptOp(",")) full.append(',').append(parseNonNegInt())
      expectOp(")")
      full.append(')')
    }
    full.toString
  }

  private def parseAtom(): Expr = {
    peek match {
      case None => fail("unexpected end of input")
      case Some(t) =>
        t.kind match {
          case TInt => next(); IntLit(t.value.toLong)
          case TFloat => next(); FloatLit(t.value.toDouble)
          case TString => next(); StringLit(t.value)
          case TQuotedIdent => parseNameOrCall()
          case TOp if t.value == "(" =>
            next()
            if (peekKw("select") || peekKw("with")) {
              val sub = parseSelect()
              expectOp(")")
              ScalarSubquery(sub)
            } else {
              val e = parseExpr()
              if (peekOp(",")) { // row constructor (a, b, ...)
                var items = Seq(e)
                while (acceptOp(",")) items :+= parseExpr()
                expectOp(")")
                RowCtor(items)
              } else {
                expectOp(")")
                e
              }
            }
          case TIdent =>
            t.lower match {
              case "null" => next(); NullLit
              case "true" => next(); BoolLit(true)
              case "false" => next(); BoolLit(false)
              case "case" => parseCase()
              case "cast" => parseCastCall()
              case "exists" =>
                next(); expectOp("(")
                val sub = parseSelect()
                expectOp(")")
                ExistsSubquery(sub, negated = false)
              case "trim" if peekAt(1).exists(x => x.kind == TOp && x.value == "(") =>
                parseTrim()
              case "position" if peekAt(1).exists(x => x.kind == TOp && x.value == "(") =>
                parsePosition()
              case "extract" if peekAt(1).exists(x => x.kind == TOp && x.value == "(") =>
                parseExtract()
              case "substring" if peekAt(1).exists(x => x.kind == TOp && x.value == "(") =>
                parseSubstring()
              case "array" if peekAt(1).exists(t => t.kind == TOp && t.value == "(") &&
                  peekAt(2).exists(t => t.kind == TIdent &&
                    (t.lower == "select" || t.lower == "with")) =>
                // ARRAY(subquery) constructor: desugared to a scalar
                // subquery collecting the item (sorted when the subquery
                // orders by its own item — psql's `ORDER BY 1` form)
                next(); next()
                val sub = parseSelect()
                expectOp(")")
                val it = sub.items match {
                  case Seq(ExprItem(e0, _)) => e0
                  case _ => fail("ARRAY(subquery) must select one column")
                }
                val agg = sub.copy(
                  items = Seq(ExprItem(CallSet("collect_list", Seq(it)), None)),
                  orderBy = Nil)
                val collected: Expr = ScalarSubquery(agg)
                if (sub.orderBy.nonEmpty)
                  Call("sort_array", Seq(collected,
                    BoolLit(sub.orderBy.head.asc)))
                else collected
              case "array" if peekAt(1).exists(t => t.kind == TOp && t.value == "[") =>
                next(); next() // array [
                var items = Seq.empty[Expr]
                if (!peekOp("]")) {
                  items :+= parseExpr()
                  while (acceptOp(",")) items :+= parseExpr()
                }
                expectOp("]")
                Call("array", items)
              case "interval" if peekAt(1).exists(_.kind == TString) =>
                next(); val s = next().value
                Call("interval", Seq(StringLit(s)))
              case kw if reserved(kw) => fail(s"unexpected keyword '$kw'")
              case _ => parseNameOrCall()
            }
          case _ => fail(s"unexpected token '${t.value}'")
        }
    }
  }

  private def parseNameOrCall(): Expr = {
    val parts = scala.collection.mutable.ArrayBuffer[String](next().value)
    while (peekOp(".") && peekAt(1).exists(t => t.kind == TIdent || t.kind == TQuotedIdent)) {
      next(); parts += next().value
    }
    // `pg_catalog.`-qualified function calls (psql emits every builtin
    // fully qualified); the schema adds nothing — same flat registry
    if ((parts.length == 1 ||
        (parts.length == 2 && (parts.head.equalsIgnoreCase("pg_catalog") ||
          parts.head.equalsIgnoreCase("information_schema")))) &&
        peekOp("(")) {
      val fn = parts.last.toLowerCase
      next() // (
      // count(*) — and `f(*)` generally parses as star-call
      if (peekOp("*")) {
        next(); expectOp(")")
        val base = CallSet(fn, Nil, star = true)
        return parseOverOpt(parseFilterOpt(base))
      }
      val distinct = acceptKw("distinct")
      var args = Seq.empty[Expr]
      if (!peekOp(")")) {
        args :+= parseExpr()
        while (acceptOp(",")) args :+= parseExpr()
      }
      expectOp(")")
      val isWindowNext = peekKw("over")
      val base: Expr =
        if (aggFunctions(fn) || fn == "count" || extraAggs.contains(fn))
          CallSet(fn, args, distinct = distinct)
        else if (windowOnlyFunctions(fn) && isWindowNext) Call(fn, args)
        else if (distinct) fail(s"DISTINCT not supported for function $fn")
        else Call(fn, args)
      parseOverOpt(parseFilterOpt(base))
    } else ColRef(parts.toSeq)
  }

  /** `x op ANY/SOME/ALL (select s from ...)` — validated here, lowered
    * in the compiler (Compiler.lowerQuantified) where the enclosing
    * negation context is known: NOT ANY / NOT ALL need three-valued
    * treatment that a fixed parse-time EXISTS desugar cannot express. */
  private def desugarQuantified(op: String, x: Expr, sub: Select,
      quant: String): Expr = {
    val se = sub.items match {
      case Seq(ExprItem(e0, _)) => e0
      case _ => fail("quantified subquery must select exactly one column")
    }
    if (sub.groupBy.nonEmpty || sub.having.nonEmpty || sub.limit.nonEmpty ||
        sub.offset.nonEmpty || sub.setOps.nonEmpty || containsSetFn(se))
      fail("quantified subquery supports plain SELECT <expr> FROM ... WHERE ...")
    QuantifiedCmp(op, x, sub, if (quant == "some") "any" else quant)
  }

  private def containsSetFn(e: Expr): Boolean = e match {
    case _: CallSet => true
    // window items are not grouping expressions either (GROUP BY ALL
    // must exclude them, like any aggregate-bearing item)
    case _: CallAnalytics => true
    case BinaryOp(_, l, r) => containsSetFn(l) || containsSetFn(r)
    case UnaryOp(_, y) => containsSetFn(y)
    case Call(_, as) => as.exists(containsSetFn)
    case RowCtor(items) => items.exists(containsSetFn)
    case InList(x, vs, _) => containsSetFn(x) || vs.exists(containsSetFn)
    case CastExpr(y, _) => containsSetFn(y)
    case CaseExpr(bs, o) =>
      bs.exists { case (c, v) => containsSetFn(c) || containsSetFn(v) } ||
        o.exists(containsSetFn)
    case _ => false
  }

  /** Aggregates that do NOT skip NULL inputs (Spark any_value/first take
    * whatever the first row gives them) — the plain CASE desugar would
    * let a filtered-out row's NULL win, so these get an explicit
    * ignoreNulls=true argument appended. */
  private val nonNullSkippingAggs = Set("any_value", "first_value_agg")

  /** `agg(args) FILTER (WHERE p)` (PG) — desugared at parse time to
    * `agg(CASE WHEN p THEN arg END)`: SQL aggregates skip NULLs, so the
    * rewrite is exact for every null-skipping aggregate (count(*)
    * becomes count(CASE WHEN p THEN 1 END)). Non-null-skipping
    * aggregates additionally get ignoreNulls=true so the CASE's NULLs
    * (the filtered rows) are skipped — row-removal semantics. */
  private def parseFilterOpt(base: Expr): Expr =
    if (peekKw("filter") && peekAt(1).exists(t => t.kind == TOp && t.value == "(")) {
      base match {
        case CallSet(fn, args, d, star) =>
          next(); expectOp("("); expectKw("where")
          val p = parseExpr()
          expectOp(")")
          val newArgs =
            if (star || args.isEmpty) Seq(CaseExpr(Seq(p -> IntLit(1)), None))
            else args.map(a => CaseExpr(Seq(p -> a), None))
          val withIgnore =
            if (nonNullSkippingAggs(fn)) newArgs :+ BoolLit(true) else newArgs
          CallSet(fn, withIgnore, d, star = false)
        case _ => fail("FILTER applies only to aggregate functions")
      }
    } else base

  private def parseOverOpt(base0: Expr): Expr = {
    // standard null-treatment placement: fn(...) IGNORE NULLS OVER (...)
    val base =
      if (peekKw("ignore") && peekKwAt(1, "nulls")) {
        next(); next(); IgnoreNulls(base0)
      } else if (peekKw("respect") && peekKwAt(1, "nulls")) {
        next(); next(); base0 // the default
      } else base0
    if (!peekKw("over")) base match {
      case IgnoreNulls(_) => fail("IGNORE NULLS requires an OVER clause")
      case _ => return base
    }
    next()
    // `OVER w` — reference to a WINDOW-clause definition, resolved by
    // the compiler once the (later) WINDOW clause has been parsed
    if (!peekOp("(")) return NamedWindowRef(base, parseIdent())
    expectOp("(")
    val d = parseWindowSpecBody()
    expectOp(")")
    CallAnalytics(base, d.partitionBy, d.orderBy, d.frame)
  }

  /** `[PARTITION BY ...] [ORDER BY ...] [ROWS|RANGE BETWEEN ...]` —
    * the body shared by inline OVER (...) and the WINDOW clause. */
  private def parseWindowSpecBody(): WindowDef = {
    var partitionBy = Seq.empty[Expr]
    if (peekKw("partition")) {
      next(); expectKw("by")
      partitionBy :+= parseExpr()
      while (acceptOp(",")) partitionBy :+= parseExpr()
    }
    var orderBy = Seq.empty[SortItem]
    if (peekKw("order")) {
      next(); expectKw("by")
      orderBy :+= parseSortItem()
      while (acceptOp(",")) orderBy :+= parseSortItem()
    }
    var frame: Option[FrameSpec] = None
    if (peekKw("rows") || peekKw("range")) {
      val kind = next().lower
      def bound(): Option[Long] = {
        if (acceptKw("unbounded")) {
          if (!acceptKw("preceding")) expectKw("following")
          None
        } else if (acceptKw("current")) { expectKw("row"); Some(0L) }
        else {
          val sign = peek match {
            case Some(x) if x.kind == TInt => next().value.toLong
            case _ => fail("expected frame bound")
          }
          if (acceptKw("preceding")) Some(-sign)
          else { expectKw("following"); Some(sign) }
        }
      }
      expectKw("between")
      val s = bound()
      expectKw("and")
      val e = bound()
      frame = Some(FrameSpec(kind, s, e))
    }
    WindowDef(partitionBy, orderBy, frame)
  }

  private def parseCase(): Expr = {
    expectKw("case")
    // simple CASE: operand before WHEN → desugar to searched with '='
    val operand: Option[Expr] = if (!peekKw("when")) Some(parseExpr()) else None
    var branches = Seq.empty[(Expr, Expr)]
    while (acceptKw("when")) {
      val cond0 = parseExpr()
      val cond = operand match {
        case Some(op) => BinaryOp("=", op, cond0)
        case None => cond0
      }
      expectKw("then")
      branches :+= (cond -> parseExpr())
    }
    val otherwise = if (acceptKw("else")) Some(parseExpr()) else None
    expectKw("end")
    CaseExpr(branches, otherwise)
  }

  private def parseCastCall(): Expr = {
    expectKw("cast"); expectOp("(")
    val e = parseExpr()
    expectKw("as")
    val ty = parseTypeName()
    expectOp(")")
    CastExpr(e, ty)
  }

  private def parseTrim(): Expr = {
    expectKw("trim"); expectOp("(")
    var mode = "both"
    var sawMode = false
    if (acceptKw("both")) { mode = "both"; sawMode = true }
    else if (acceptKw("leading")) { mode = "leading"; sawMode = true }
    else if (acceptKw("trailing")) { mode = "trailing"; sawMode = true }
    val first = if (!peekKw("from")) Some(parseExpr()) else None
    if (acceptKw("from")) {
      val src = parseExpr()
      expectOp(")")
      Call(s"trim_$mode", Seq(first.getOrElse(StringLit(" ")), src))
    } else {
      // plain trim(s) [or trim(s, chars) extension]
      if (sawMode) fail("expected FROM in trim()")
      var args = Seq(first.getOrElse(fail("expected expression in trim()")))
      while (acceptOp(",")) args :+= parseExpr()
      expectOp(")")
      if (args.length == 2) Call("trim_both", Seq(args(1), args(0)))
      else Call("trim_both", Seq(StringLit(" "), args.head))
    }
  }

  private def parsePosition(): Expr = {
    expectKw("position"); expectOp("(")
    val needle = parseBitShift() // stop before IN
    expectKw("in")
    val hay = parseExpr()
    expectOp(")")
    Call("position", Seq(needle, hay))
  }

  private def parseExtract(): Expr = {
    expectKw("extract"); expectOp("(")
    val field = peek match {
      case Some(t) if t.kind == TIdent => next(); t.lower
      case _ => fail("expected date field")
    }
    expectKw("from")
    val e = parseExpr()
    expectOp(")")
    Call("extract", Seq(StringLit(field), e))
  }

  private def parseSubstring(): Expr = {
    expectKw("substring"); expectOp("(")
    val s = parseExpr()
    if (acceptKw("from")) {
      val start = parseExpr()
      val len = if (acceptKw("for")) Some(parseExpr()) else None
      expectOp(")")
      Call("substring", Seq(s, start) ++ len)
    } else {
      var args = Seq(s)
      while (acceptOp(",")) args :+= parseExpr()
      expectOp(")")
      Call("substring", args)
    }
  }
}

object Parser {
  /** Parse with an optional set of user-registered aggregate (UDAF)
    * names — the grammar must type `f(x)` as a set function to route it
    * through the aggregation path (global aggregates, HAVING). The set
    * is per-caller (each Executor threads its own), so one session's
    * UDAF registration cannot reclassify a name for another session. */
  def parse(sql: String, extraAggs: Set[String] = Set.empty): Statement =
    new Parser(Tokenizer.tokenize(sql), extraAggs).parseStatement()
  def parseQuery(sql: String): Select =
    parse(sql) match {
      case s: Select => s
      case other => throw new ParseException(s"expected SELECT, got $other")
    }
  def parseExpression(sql: String): Expr = {
    val p = new Parser(Tokenizer.tokenize(sql))
    p.parseExpr()
  }
}
