package graft

import java.sql.Timestamp

import graft.model.{FtmModel, Statement}
import graft.ops.{EntityAssembly, Explode, MergeDedupe}
import graft.query.{FtmQuery, Rql}
import graft.query.FtmQuery._

class QueryAssemblySpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def stmt(entity: String, schema: String, prop: String, value: String,
      origin: String = "o1", dataset: String = "ds"): Statement =
    Statement(
      shard = "0", id = s"$entity-$prop-$value", entity_id = entity,
      dataset = dataset, bucket = FtmModel.bucketOf(schema), origin = origin,
      source = None, schema = schema, prop = prop,
      prop_type = FtmModel.propTypes(prop), value = value,
      original_value = None, lang = None, external = false,
      first_seen = ts("2024-01-01 00:00:00"), last_seen = ts("2024-01-02 00:00:00"),
      fragment = "", deleted_at = None)

  private def fixture = {
    import spark.implicits._
    Seq(
      stmt("p1", "Person", "name", "Alice"),
      stmt("p1", "Person", "nationality", "de"),
      stmt("p1", "Person", "name", "Alicia", origin = "o2"),
      stmt("p2", "Person", "name", "Bob"),
      stmt("c1", "Company", "name", "Acme"),
      stmt("d1", "Pages", "fileName", "report.pdf"),
      stmt("d1", "Pages", "contentHash", "abc123")).toDS().toDF()
  }

  test("schema lattice: descendants, most-specific, buckets") {
    assert(FtmModel.descendants("Document").contains("Pages"))
    assert(FtmModel.descendants("LegalEntity") ==
      Set("LegalEntity", "Person", "Company", "Organization", "PublicBody"))
    assert(FtmModel.mostSpecific(Set("Thing", "LegalEntity", "Person")) == "Person")
    // incomparable set falls back to deepest common ancestor
    assert(FtmModel.mostSpecific(Set("Person", "Company")) == "LegalEntity")
    assert(FtmModel.bucketOf("Pages") == "pages")
    assert(FtmModel.bucketOf("Person") == "thing")
    assert(FtmModel.bucketOf("Membership") == "interval")
  }

  test("full-model breadth: asset/identification/sanction schemata resolve, not defaults") {
    // the resource-backed model covers the published FtM breadth — these
    // schemata previously fell to default bucket/caption silently
    assert(FtmModel.parents.size >= 60)
    assert(FtmModel.bucketOf("Vessel") == "thing")     // Vehicle → Asset → Thing
    assert(FtmModel.bucketOf("Sanction") == "interval")
    assert(FtmModel.bucketOf("Passport") == "interval")
    assert(FtmModel.bucketOf("Workbook") == "document") // Folder → Document
    assert(FtmModel.ancestors("Airplane").contains("Asset"))
    assert(FtmModel.descendants("Asset").contains("Company"))
    assert(FtmModel.mostSpecific(Set("Vehicle", "Vessel")) == "Vessel")
    // caption declarations + BFS inheritance over the wider lattice
    assert(FtmModel.captionProps("Passport") == Seq("passportNumber", "number"))
    assert(FtmModel.captionProps("Airplane") == Seq("registrationNumber", "name"))
    assert(FtmModel.captionProps("BankAccount") == Seq("accountNumber", "iban"))
    // property typing from the resource map
    assert(FtmModel.propTypes("passportNumber") == "identifier")
    assert(FtmModel.propTypes("jurisdiction") == "country")
    assert(FtmModel.propTypes("notAProperty") == "string")
    assert(FtmModel.nonLinguistic.contains("identifier"))
    assert(FtmModel.modelVersion.nonEmpty && FtmModel.modelVersion != "unversioned")
    // long tail of the full published registry: an unmapped property
    // would silently fall to `string` and keep a lang it shouldn't
    assert(FtmModel.propTypes("swiftBic") == "identifier")
    assert(FtmModel.propTypes("innCode") == "identifier")
    assert(FtmModel.propTypes("okvedCode") == "identifier")
    assert(FtmModel.propTypes("cusip") == "identifier")
    assert(FtmModel.propTypes("iban") == "iban")
    assert(FtmModel.propTypes("ibanMentioned") == "iban")
    assert(FtmModel.propTypes("ipMentioned") == "ip")
    assert(FtmModel.propTypes("bodyHtml") == "html")
    assert(FtmModel.propTypes("headers") == "json")
    assert(FtmModel.propTypes("maturityDate") == "date")
    assert(FtmModel.propTypes("flag") == "country")
    assert(FtmModel.propTypes("callerNumber") == "phone")
    assert(FtmModel.propTypes("emitters") == "entity")
    assert(FtmModel.propTypes("grossRegisteredTonnage") == "number")
    assert(FtmModel.propTypes("peopleMentioned") == "name")
    assert(FtmModel.propTypes("namesMentioned") == "name")
    assert(FtmModel.propTypes("translatedText") == "text")
    assert(FtmModel.propTypes("translatedLanguage") == "language")
    assert(FtmModel.propTypes("inReplyToMessage") == "entity")
    assert(FtmModel.propTypes("employer") == "entity")
    assert(FtmModel.propTypes("employee") == "entity")
    assert(FtmModel.propTypes("receiver") == "entity")
    assert(FtmModel.propTypes("numberOfSeats") == "number")
    assert(FtmModel.propTypes("cpvCode") == "identifier")
    assert(FtmModel.propTypes("osmId") == "identifier")
    assert(FtmModel.propTypes("declarationUrl") == "url")
    assert(FtmModel.propTypes("inceptionDate") == "date")
    // lang nulling is registry-driven: value types that can't carry a
    // language are nulled, linguistic ones keep theirs (F8)
    assert(FtmModel.nonLinguistic("iban") && FtmModel.nonLinguistic("ip"))
    assert(FtmModel.nonLinguistic("json"))
    assert(!FtmModel.nonLinguistic("html") && !FtmModel.nonLinguistic("text"))
    assert(!FtmModel.nonLinguistic(FtmModel.propTypes("bodyText")))
    assert(FtmModel.propTypes.size >= 240)
  }

  test("schemata filter expands to descendants and prunes buckets") {
    val q = Query(schemata = Some("Document"))
    val out = FtmQuery.compile(q, fixture)
    assert(out.select("entity_id").distinct().collect().map(_.getString(0)).toSet == Set("d1"))
  }

  test("property filter is entity-grain: all statements of matching entities") {
    val q = Query(propFilters = Seq(P("name", EqOp, Seq("Alice"))))
    val out = FtmQuery.compile(q, fixture)
    // p1 matches via name=Alice; ALL of p1's statements return, including
    // the other-origin name and the nationality
    assert(out.count() == 3)
  }

  test("RQL wire strings parse into the same query AST the API builds") {
    import graft.query.Rql
    // reserved fields route to M/origin/schemata slots; other keys are
    // entity-grain property filters
    val q = Rql.parse(
      "and(eq(origin,o1),eq(schema,Person),eq(name,Alice))",
      orderBy = Seq("-name"), limit = Some(5), offset = 2)
    assert(q.origin.contains("o1") && q.schemata.contains("Person"))
    assert(q.propFilters == Seq(P("name", EqOp, Seq("Alice"))))
    assert(q.orderByProps == Seq(("name", true)) && q.limit.contains(5) && q.offset == 2)
    // wire query compiles identically to the hand-built AST
    val hand = Query(origin = Some("o1"), schemata = Some("Person"),
      propFilters = Seq(P("name", EqOp, Seq("Alice"))))
    val viaWire = FtmQuery.compile(q.copy(orderByProps = Seq.empty, limit = None, offset = 0), fixture)
    val viaAst = FtmQuery.compile(hand, fixture)
    assert(viaWire.collect().toSet == viaAst.collect().toSet)

    // in-lists, null checks, comparator aliases
    val q2 = Rql.parse("and(in(entity_id,(p1,p2)),not_null(value),gte(click,50))")
    assert(q2.statementFilters == Seq(
      M("entity_id", InOp, Seq("p1", "p2")), M("value", NotNullOp, Seq.empty)))
    assert(q2.propFilters == Seq(P("click", GteOp, Seq("50"))))
    // single leaf without and()
    assert(Rql.parse("eq(name,Bob)").propFilters == Seq(P("name", EqOp, Seq("Bob"))))

    // non-eq schema predicates are EXACT column filters on the physical
    // schema column (only eq expands descendants via the dedicated
    // slot) — NOT a property filter on a prop literally named "schema",
    // which would silently match nothing
    val q3 = Rql.parse("and(in(schema,(Person,Company)),ne(schemata,Thing))")
    assert(q3.schemata.isEmpty && q3.propFilters.isEmpty)
    assert(q3.statementFilters == Seq(
      M("schema", InOp, Seq("Person", "Company")), M("schema", NotOp, Seq("Thing"))))
    // wrong-arity calls are the clean reject path, and a scalar
    // comparator never silently drops tuple values
    for (bad <- Seq("eq()", "eq(name)", "eq(origin,())", "eq(name,(a,b))",
        "null(a,b)", "in(name)"))
      assertThrows[IllegalArgumentException](Rql.parse(bad))
    // empty IN is legal (matches nothing) and round-trips
    val q4 = Rql.parse("in(dataset,())")
    assert(q4.statementFilters == Seq(M("dataset", InOp, Seq.empty)))
    assert(Rql.parse(Rql.render(q4)) == q4)
    // malformed input fails loudly, like the reference's 422 path
    intercept[IllegalArgumentException](Rql.parse("and(eq(name,Bob)") )
    intercept[IllegalArgumentException](Rql.parse("or(eq(a,b),eq(c,d))"))
    intercept[IllegalArgumentException](Rql.parse("eq(name,Bob)trailing"))
    // the DoS caps still guard the compiled wire query
    val wide = (1 to 25).map(i => s"eq(p$i,v)").mkString("and(", ",", ")")
    intercept[IllegalArgumentException](FtmQuery.compile(Rql.parse(wide), fixture))

    // quoted literals: ftmq values can carry arbitrary bytes — the
    // delimiters and quotes round-trip through the quoted form
    assert(Rql.parse("""eq(name,"Smith, John (Jr.)")""").propFilters ==
      Seq(P("name", EqOp, Seq("Smith, John (Jr.)"))))
    assert(Rql.parse("""eq(name,"she said \"hi\"")""").propFilters ==
      Seq(P("name", EqOp, Seq("""she said "hi""""))))
    assert(Rql.parse("""eq(name,'it\'s')""").propFilters ==
      Seq(P("name", EqOp, Seq("it's"))))
    assert(Rql.parse("""eq(path,"C:\\dir\\file")""").propFilters ==
      Seq(P("path", EqOp, Seq("""C:\dir\file"""))))
    // quoted values inside IN tuples, empty string is a legal value
    assert(Rql.parse("""in(name,("a,b","c)d",plain))""").propFilters ==
      Seq(P("name", InOp, Seq("a,b", "c)d", "plain"))))
    assert(Rql.parse("""eq(name,"")""").propFilters ==
      Seq(P("name", EqOp, Seq(""))))
    // a quoted token is a value, never a call — and unterminated fails
    assert(Rql.parse("""eq(name,"eq(a,b)")""").propFilters ==
      Seq(P("name", EqOp, Seq("eq(a,b)"))))
    intercept[IllegalArgumentException](Rql.parse("""eq(name,"open"""))
    // nesting-depth cap: a pathological a(a(a(... wire string fails in
    // the parser, never as a stack overflow
    val deep = "a(" * 100000 + "x" + ")" * 100000
    intercept[IllegalArgumentException](Rql.parse(deep))
  }

  test("origin filter restricts statements, order/slice paginate entities") {
    val q = Query(origin = Some("o1"))
    assert(FtmQuery.compile(q, fixture).count() == 6)

    val ordered = FtmQuery.entityIds(
      Query(schemata = Some("LegalEntity"),
        orderByProps = Seq(("name", false)), limit = Some(2)), fixture)
    assert(ordered.collect().map(_.getString(0)).toSeq == Seq("c1", "p1")) // Acme, Alice

    val page2 = FtmQuery.entityIds(
      Query(schemata = Some("LegalEntity"),
        orderByProps = Seq(("name", false)), limit = Some(2), offset = 2), fixture)
    assert(page2.collect().map(_.getString(0)).toSeq == Seq("p2")) // Bob

    // multi-prop ordering: nationality first (only p1 has one, nulls
    // last), then name breaks the ties among the rest
    val multi = FtmQuery.entityIds(
      Query(schemata = Some("LegalEntity"),
        orderByProps = Seq(("nationality", false), ("name", false))), fixture)
    assert(multi.collect().map(_.getString(0)).toSeq == Seq("p1", "c1", "p2"))
  }

  test("offset without limit: bounded two-phase drop, no global window") {
    // ftmq's legal open-ended slice `[1:]` — rounds ≤12 ran a row_number
    // over an UNPARTITIONED window here, pulling the whole ordered match
    // set through one partition when no limit bounded it
    val q = Query(schemata = Some("LegalEntity"),
      orderByProps = Seq(("name", false)), offset = 1)
    val ids = FtmQuery.entityIds(q, fixture)
    assert(ids.collect().map(_.getString(0)).toSeq == Seq("p1", "p2")) // Acme dropped
    val (page, _) = FtmQuery.entityIdPage(q, fixture)
    val plan = page.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"offset drop must not plan a window:\n$plan")
    // offset past the match set is an empty page, not an error
    assert(FtmQuery.entityIds(q.copy(offset = 10), fixture).count() == 0)
    // offset+limit pagination walks the same total order as the full scan
    val all = FtmQuery.entityIds(q.copy(offset = 0), fixture)
      .collect().map(_.getString(0)).toSeq
    assert(all == Seq("c1", "p1", "p2"))
    val paged = all.indices.flatMap(i => FtmQuery.entityIds(
      q.copy(offset = i, limit = Some(1)), fixture).collect().map(_.getString(0)))
    assert(paged == all)
  }

  test("offset drop exactness: randomized key collisions vs a local reference") {
    import spark.implicits._
    // 200 entities whose order key collides heavily (20 distinct names),
    // so the drop-set uniqueness rests entirely on the entity_id
    // tie-break — the property the anti-join form's exactness needs
    val rnd = new scala.util.Random(13)
    val rows = (0 until 200).map { i =>
      val name = f"n${rnd.nextInt(20)}%02d"
      (f"e$i%03d", name)
    }
    val big = rows.map { case (e, n) => stmt(e, "Person", "name", n) }
      .toDS().toDF()
    // local reference: sort by (name asc nulls-last, entity_id), slice
    val order = rows.sortBy { case (e, n) => (n, e) }.map(_._1)
    for (offset <- Seq(0, 1, 7, 50, 199, 250); limit <- Seq(None, Some(1), Some(10))) {
      val got = FtmQuery.entityIds(
        Query(schemata = Some("Person"),
          orderByProps = Seq(("name", false)), limit = limit, offset = offset),
        big).collect().map(_.getString(0)).toSeq
      val want = limit match {
        case Some(n) => order.slice(offset, offset + n)
        case None => order.drop(offset)
      }
      assert(got == want, s"offset=$offset limit=$limit")
    }
  }

  test("filter-leaf and IN-value caps are enforced") {
    val tooMany = (1 to 21).map(i => M("prop", EqOp, Seq(s"v$i")))
    intercept[IllegalArgumentException] {
      FtmQuery.compile(Query(statementFilters = tooMany), fixture)
    }
  }

  test("RQL caps fire at the wire boundary, before AST construction") {
    // an oversized IN tuple is rejected while parsing, not at compile
    val hugeIn = s"in(name, (${(1 to FtmQuery.MaxInValues + 1).map("v" + _).mkString(",")}))"
    intercept[IllegalArgumentException](Rql.parse(hugeIn))
    // a hostile and() with too many leaves likewise dies in the parser
    val hugeAnd = s"and(${(1 to FtmQuery.MaxFilterLeaves + 2).map(i => s"eq(k$i, v$i)").mkString(",")})"
    intercept[IllegalArgumentException](Rql.parse(hugeAnd))
    // at-cap queries still parse
    val okIn = s"in(name, (${(1 to 100).map("v" + _).mkString(",")}))"
    assert(Rql.parse(okIn).propFilters.head.values.length == 100)
    // wire-level slice caps: deep/negative offsets and negative limits
    // die at the boundary (the two-phase drop is distributed, but its
    // head is still an offset-row top-k — keyset pagination owns deep
    // scans); at-cap passes
    intercept[IllegalArgumentException](
      Rql.applySiblings(Query(), Seq.empty, None, Rql.MaxWireOffset + 1))
    intercept[IllegalArgumentException](
      Rql.applySiblings(Query(), Seq.empty, None, -1))
    intercept[IllegalArgumentException](
      Rql.applySiblings(Query(), Seq.empty, Some(-5), 0))
    // limit is capped at the wire too: an uncapped near-Int.MaxValue
    // limit would drive the page's limit(offset+n) top-k to a
    // billion-row single-partition window (and overflow Int)
    intercept[IllegalArgumentException](
      Rql.applySiblings(Query(), Seq.empty, Some(Rql.MaxWireLimit + 1), 0))
    intercept[IllegalArgumentException](
      Rql.applySiblings(Query(), Seq.empty, Some(Int.MaxValue), 0))
    assert(Rql.applySiblings(Query(), Seq.empty, None, Rql.MaxWireOffset)
      .offset == Rql.MaxWireOffset)
    assert(Rql.applySiblings(Query(), Seq.empty, Some(Rql.MaxWireLimit), 0)
      .limit.contains(Rql.MaxWireLimit))
    // the programmatic API stays uncapped but overflow-guarded: offset+n
    // past Int.MaxValue fails with instructions, not a negative limit
    // crash inside Spark analysis
    intercept[IllegalArgumentException](FtmQuery.entityIdPage(
      Query(offset = Rql.MaxWireOffset, limit = Some(Int.MaxValue)), fixture))
  }

  test("entity assembly: caption, most-specific schema, property fold, origins") {
    val entities = EntityAssembly.assemble(fixture)
    val byId = entities.collect().map(e => e.id -> e).toMap
    val p1 = byId("p1")
    assert(p1.caption == "Alice")
    assert(p1.schema == "Person")
    assert(p1.properties("name").toSet == Set("Alice", "Alicia"))
    assert(p1.origins == Seq("o1", "o2"))
    // fileName is in the caption preference list for documents
    assert(byId("d1").caption == "report.pdf")
  }

  test("xref: shared normalized keys pair entities, hot blocks and singletons drop") {
    import spark.implicits._
    import graft.ops.Xref
    // a/b share two keys (pair), a/c share one (below minShared), and
    // every entity holds the hot key (block over cap -> no signal)
    val hot = (1 to 20).map(i => ("k:hot", s"e$i"))
    val keys = (Seq(
      ("k:x1", "a"), ("k:x1", "b"),
      ("k:x2", "a"), ("k:x2", "b"),
      ("k:y1", "a"), ("k:y1", "c")) ++ hot)
      .toDF("block", "id")
    val got = Xref.candidates(keys, "block", "id", maxBlock = 10, minShared = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", "b", 2L)))
    // single shuffle on the blocking key — no cartesian/nested-loop join
    val plan = Xref.candidates(keys, "block", "id").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("explode round-trips through assembly") {
    import spark.implicits._
    val payloads = Seq(
      Explode.EntityPayload("p9.sig", "Person",
        Map("name" -> Seq("Zed"), "nationality" -> Seq("fr", "de")))).toDS()
    val stmts = Explode.explode(payloads, "ds", "o1", shards = 4, now = ts("2024-01-01 00:00:00"))
    // 3 prop rows + 1 BASE_ID checksum row; namespace stripped from the id
    assert(stmts.count() == 4)
    assert(stmts.select("entity_id").distinct().collect().head.getString(0) == "p9")
    val asm = EntityAssembly.assemble(MergeDedupe.live(stmts)).collect().head
    assert(asm.caption == "Zed")
    assert(asm.properties("nationality").toSet == Set("fr", "de"))
    // BASE_ID row drives last_change, and is not exposed as a property
    assert(!asm.properties.contains("id"))
  }
}
