package graft.query

import graft.query.FtmQuery._

/** RQL wire-format parser for the query funnel (reference: ftmq
  * `Query.from_rql` consumed by api/dependencies.py:78-167 — the HTTP
  * body carries the filter tree as an RQL string; order/limit/offset ride
  * as sibling fields because RQL does not serialize them).
  *
  * Grammar (conjunctive subset, like the reference's query semantics):
  *
  *   expr   := call
  *   call   := name '(' args ')'
  *   args   := arg (',' arg)*
  *   arg    := call | '(' atoms ')' | atom
  *
  * Calls: `and(e...)`, `eq|ne|gt|gte|lt|lte|like(key, value)`,
  * `in|not_in(key, (v...))`, `null|not_null(key)`.
  *
  * Key routing mirrors ftmq: reserved statement-grain fields become
  * M-filters (`origin` and `schema` map onto the dedicated Query slots so
  * bucket pruning and descendant expansion still fire); any other key is
  * an entity-grain property filter (P).
  *
  * The DoS caps ([[FtmQuery.MaxFilterLeaves]], [[FtmQuery.MaxInValues]])
  * are enforced INSIDE the parser loops, before AST construction — the
  * reference caps at the wire boundary the same way
  * (api/dependencies.py:105-139). A hostile million-leaf `and()` or a
  * ten-million-value IN tuple is rejected after reading cap+1 items, not
  * after materializing the whole tree; `FtmQuery.compile` re-validates
  * the AST as defense in depth for programmatically built queries.
  */
object Rql {

  private val ReservedFields = Set(
    "entity_id", "canonical_id", "dataset", "origin", "bucket", "prop",
    "value", "lang", "external", "fragment", "id")

  sealed private trait Node
  private case class Call(name: String, args: Seq[Node]) extends Node
  private case class Atom(value: String) extends Node
  private case class Tuple(values: Seq[String]) extends Node

  /** Nesting-depth cap: parseArg/parseCall recurse per nesting level, so
    * an unbounded `a(a(a(…` wire string would overflow the stack — the
    * same in-parser DoS class as the leaf/IN caps. Real queries nest
    * twice (`and(eq(...))`).
    */
  val MaxDepth = 64

  private class Parser(s: String) {
    private var i = 0
    private var depth = 0
    private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      ws()
      if (i >= s.length || s(i) != c) fail(s"expected '$c'")
      i += 1
    }
    private def fail(msg: String) =
      throw new IllegalArgumentException(s"invalid RQL at offset $i: $msg")

    /** Quoted value: `"..."` or `'...'` with backslash escapes — ftmq
      * wire strings carry arbitrary value bytes, so delimiters (`,` `(`
      * `)`) and quotes inside a value need a quoted form. `\x` yields the
      * literal `x` for any x (covers `\"` `\'` `\\`). An empty quoted
      * string is a legitimate value.
      */
    private def quotedText(): String = {
      val quote = s(i)
      i += 1
      val sb = new StringBuilder
      while (i < s.length && s(i) != quote) {
        if (s(i) == '\\' && i + 1 < s.length) { sb.append(s(i + 1)); i += 2 }
        else { sb.append(s(i)); i += 1 }
      }
      if (i >= s.length) fail("unterminated quoted value")
      i += 1
      sb.toString
    }

    private def atomText(): String = {
      ws()
      if (i < s.length && (s(i) == '"' || s(i) == '\'')) return quotedText()
      val start = i
      while (i < s.length && !",()".contains(s(i))) i += 1
      val t = s.substring(start, i).trim
      if (t.isEmpty) fail("empty token")
      t
    }

    def parseCall(): Call = {
      depth += 1
      if (depth > MaxDepth) fail(s"expression nested deeper than $MaxDepth")
      val name = atomText()
      expect('(')
      val args = scala.collection.mutable.ListBuffer.empty[Node]
      ws()
      if (i < s.length && s(i) != ')') {
        args += parseArg()
        ws()
        while (i < s.length && s(i) == ',') {
          // wire-boundary cap: an and() carries one call per filter leaf
          // (+1 headroom for binary calls' key/value args) — stop reading
          // a hostile arg list at the cap instead of materializing it
          if (args.length > FtmQuery.MaxFilterLeaves)
            fail(s"too many call arguments (cap ${FtmQuery.MaxFilterLeaves})")
          i += 1; args += parseArg(); ws()
        }
      }
      expect(')')
      depth -= 1
      Call(name, args.toList)
    }

    private def parseArg(): Node = {
      ws()
      if (i < s.length && s(i) == '(') {
        i += 1
        val vals = scala.collection.mutable.ListBuffer.empty[String]
        ws()
        if (i < s.length && s(i) != ')') {
          vals += atomText()
          ws()
          while (i < s.length && s(i) == ',') {
            // wire-boundary cap: reject an oversized IN tuple after
            // cap+1 values, before the list is built
            if (vals.length >= FtmQuery.MaxInValues)
              fail(s"too many IN values (cap ${FtmQuery.MaxInValues})")
            i += 1; vals += atomText(); ws()
          }
        }
        expect(')')
        Tuple(vals.toList)
      } else if (i < s.length && (s(i) == '"' || s(i) == '\'')) {
        // a quoted token is always a value, never a nested call name —
        // no call lookahead, so `eq(name, "a(b)")` parses as the literal
        Atom(quotedText())
      } else {
        val save = i
        val t = atomText()
        ws()
        if (i < s.length && s(i) == '(') { i = save; parseCall() }
        else Atom(t)
      }
    }

    def atEnd: Boolean = { ws(); i >= s.length }
  }

  private def comparatorOf(name: String): Comparator = name match {
    case "eq" => EqOp
    case "ne" | "neq" => NotOp
    case "gt" => GtOp
    case "gte" | "ge" => GteOp
    case "lt" => LtOp
    case "lte" | "le" => LteOp
    case "like" => LikeOp
    case "in" => InOp
    case "not_in" | "out" => NotInOp
    case "null" => NullOp
    case "not_null" => NotNullOp
    case other => throw new IllegalArgumentException(s"unsupported RQL operator: $other")
  }

  private def key(n: Node): String = n match {
    case Atom(v) => v
    case _ => throw new IllegalArgumentException("filter key must be an atom")
  }

  private def values(n: Node): Seq[String] = n match {
    case Atom(v) => Seq(v)
    case Tuple(vs) => vs
    case _ => throw new IllegalArgumentException("filter value must be atom or tuple")
  }

  private def opName(c: Comparator): String = c match {
    case EqOp => "eq"
    case NotOp => "ne"
    case GtOp => "gt"
    case GteOp => "gte"
    case LtOp => "lt"
    case LteOp => "lte"
    case LikeOp => "like"
    case InOp => "in"
    case NotInOp => "not_in"
    case NullOp => "null"
    case NotNullOp => "not_null"
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c => c.toString
    } + "\""

  private def leafRql(k: String, op: Comparator, vs: Seq[String]): String = op match {
    case NullOp | NotNullOp => s"${opName(op)}(${quote(k)})"
    case InOp | NotInOp =>
      s"${opName(op)}(${quote(k)}, (${vs.map(quote).mkString(", ")}))"
    case _ => s"${opName(op)}(${quote(k)}, ${quote(vs.head)})"
  }

  /** Serialize a Query's filter tree back to the RQL wire form (the
    * inverse of [[parse]] over the filter slots; order/limit/offset ride
    * as sibling fields and are not part of the wire string). Every key
    * and value is emitted quoted with `\`-escaping, so arbitrary bytes —
    * delimiters, quotes, whitespace — round-trip; PropertySpec pins
    * `parse(render(q)) == q` over randomized trees.
    */
  def render(q: Query): String = {
    val leaves =
      q.origin.map(o => leafRql("origin", EqOp, Seq(o))).toSeq ++
        q.schemata.map(s => leafRql("schema", EqOp, Seq(s))).toSeq ++
        q.statementFilters.map(m => leafRql(m.field, m.op, m.values)) ++
        q.propFilters.map(p => leafRql(p.prop, p.op, p.values))
    s"and(${leaves.mkString(", ")})"
  }

  /** Parse an RQL string plus the sibling sort/slice fields into a Query.
    * Multi-value `orderBy` follows the reference: the FIRST value's `-`
    * prefix sets the direction for every column
    * (api/dependencies.py:159-162).
    */
  def parse(rql: String, orderBy: Seq[String] = Seq.empty,
      limit: Option[Int] = None, offset: Int = 0): Query = {
    val p = new Parser(rql)
    val root = p.parseCall()
    if (!p.atEnd) throw new IllegalArgumentException("trailing input after RQL expression")
    val leaves = root match {
      case Call("and", args) => args.map {
        case c: Call => c
        case _ => throw new IllegalArgumentException("and() arguments must be calls")
      }
      case c => Seq(c)
    }
    var q = Query()
    leaves.foreach { case Call(name, args) =>
      val op = comparatorOf(name)
      // arity validated BEFORE indexing: `eq()` / `eq(k)` / `eq(k, ())`
      // / `eq(k, (a, b))` must be the 400 path (IllegalArgumentException)
      // like every other malformed wire input — args.head / args(1) /
      // vs.head would throw NoSuchElement/IndexOutOfBounds (mapped to
      // 404/500), and a scalar comparator handed a tuple would silently
      // drop every value after the first. The per-comparator value
      // arity is FtmQuery.requiredValues — the same spec validate()
      // enforces on programmatic queries, so wire and API never drift
      // (empty IN tuples stay legal on both: render emits them).
      val isNullCheck = op == NullOp || op == NotNullOp
      val wantArgs = if (isNullCheck) 1 else 2
      require(args.size == wantArgs,
        s"$name() takes $wantArgs argument(s), got ${args.size}")
      val k = key(args.head)
      val vs = if (isNullCheck) Seq.empty[String] else values(args(1))
      FtmQuery.requiredValues(op).foreach(n => require(vs.size == n,
        s"$name() takes exactly $n value(s), got ${vs.size}"))
      (k, op) match {
        case ("origin", EqOp) => q = q.copy(origin = Some(vs.head))
        case ("schema", EqOp) | ("schemata", EqOp) =>
          q = q.copy(schemata = Some(vs.head))
        case ("schema", _) | ("schemata", _) =>
          // non-eq schema predicates are EXACT column filters on the
          // physical `schema` column (in/ne/null/...): only eq carries
          // the descendant-expanding semantics of the dedicated slot.
          // Falling through to a P filter here would compile
          // col("prop") === "schema" — no statement has that prop, so
          // the query would silently return an empty page
          q = q.copy(statementFilters = q.statementFilters :+ M("schema", op, vs))
        case _ if ReservedFields.contains(k) =>
          q = q.copy(statementFilters = q.statementFilters :+ M(k, op, vs))
        case _ =>
          q = q.copy(propFilters = q.propFilters :+ P(k, op, vs))
      }
    }
    applySiblings(q, orderBy, limit, offset)
  }

  /** Fold the sibling sort/slice fields into a Query — shared by [[parse]]
    * and by API bodies that carry order/limit/offset WITHOUT an RQL filter
    * string (reference QueryBody.to_query, api/dependencies.py:155-167).
    * Multi-value `orderBy` follows the reference: the FIRST value's `-`
    * prefix sets the direction for every column.
    */
  /** Wire-level slice caps (DoS bounds beside the filter caps, reference
    * core/settings.py:89-93): the offset drop is distributed (two-phase
    * anti-join, FtmQuery.entityIdPage), but its head is still an
    * offset-row top-k — deep slices belong to keyset pagination, not
    * `[10^9:]`. The LIMIT cap is the same bound on the same plan shape:
    * with limit present the page runs `limit(offset+n)` then a bounded
    * window, so an uncapped wire limit would drive a near-billion-row
    * top-k into one partition (and `offset+n` could overflow Int). Wire
    * boundary only; the programmatic Query API is for trusted callers
    * and stays uncapped (with overflow still guarded in
    * FtmQuery.entityIdPage).
    */
  val MaxWireOffset = 100000
  val MaxWireLimit = 100000

  def applySiblings(q: Query, orderBy: Seq[String],
      limit: Option[Int], offset: Int): Query = {
    require(offset >= 0, s"negative offset: $offset")
    require(offset <= MaxWireOffset,
      s"offset $offset exceeds the wire cap $MaxWireOffset — page with a keyset cursor instead")
    require(limit.forall(_ >= 0), s"negative limit: $limit")
    require(limit.forall(_ <= MaxWireLimit),
      s"limit ${limit.get} exceeds the wire cap $MaxWireLimit — page with a keyset cursor instead")
    val ordered =
      if (orderBy.isEmpty) q
      else {
        val descending = orderBy.head.startsWith("-")
        q.copy(orderByProps =
          orderBy.map(o => (o.stripPrefix("-"), descending)))
      }
    ordered.copy(limit = limit, offset = offset)
  }
}
