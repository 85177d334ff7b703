package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.model.Statement
import graft.ops.MergeDedupe

/** Property-based invariants for the core operators (plain scalacheck
  * generators with pinned seeds — the scalatest bridge artifact is not in
  * the offline cache): merge idempotence, cluster labeling vs a reference
  * union-find, and column/scala twin agreement for the scalar kernels.
  */
class PropertySpec extends SparkSpec {

  private def ts(epochSec: Long) = new Timestamp(epochSec * 1000)

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private val genStatement: Gen[Statement] = for {
    e <- Gen.choose(0, 5)
    p <- Gen.oneOf("name", "click", "view")
    v <- Gen.choose(0, 9)
    frag <- Gen.oneOf("", "f0", "f1")
    fs <- Gen.choose(1700000000L, 1700000500L)
    ls <- Gen.choose(1700000000L, 1700000500L)
    del <- Gen.option(Gen.choose(1700000000L, 1700000500L))
  } yield Statement(
    shard = (e % 2).toString, id = s"id-$e-$p-$v", entity_id = s"e$e",
    dataset = "ds", bucket = "thing", origin = "o1", source = None,
    schema = "Person", prop = p, prop_type = "string", value = v.toString,
    original_value = None, lang = None, external = false,
    first_seen = ts(fs), last_seen = ts(ls), fragment = frag,
    deleted_at = del.map(ts))

  test("merge dedupe is idempotent on arbitrary statement batches") {
    import spark.implicits._
    samples(Gen.listOfN(40, genStatement), 5).foreach { stmts =>
      val df = stmts.toDS().toDF()
      val once = MergeDedupe.canonicalize(df)
      val twice = MergeDedupe.canonicalize(once)
      val a = once.collect().map(_.toString).sorted.toSeq
      val b = twice.collect().map(_.toString).sorted.toSeq
      assert(a == b, s"not idempotent for batch: ${stmts.take(3)}…")
    }
  }

  test("dupClusters matches a reference union-find on random edge lists") {
    import spark.implicits._
    val genEdges = Gen.listOfN(12,
      Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 9L)))
    samples(genEdges, 5).foreach { edges0 =>
      val edges = edges0.filter(p => p._1 != p._2)
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      if (edges.nonEmpty) {
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val roots = nodes.map(n => n -> find(n)).toMap
        val minOf = roots.groupBy(_._2).map { case (r, m) => r -> m.keys.min }
        val expected = nodes.map(n => n -> minOf(roots(n))).toMap

        val got = graft.dedupe.Dedupe.dupClusters(edges.toDF("id_a", "id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected, s"edges: $edges")
      }
    }
  }

  test("RQL round-trips: parse(render(q)) == q over random filter trees") {
    import graft.query.FtmQuery._
    import graft.query.Rql
    // values stress the wire format: delimiters, both quote chars,
    // backslashes, whitespace, unicode, empty strings
    val genValue: Gen[String] = Gen.choose(0, 10).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        4 -> Gen.alphaNumChar.map(_.toString),
        3 -> Gen.oneOf(",", "(", ")", "\"", "'", "\\", " ", "\t", "é", "中"),
        1 -> Gen.const("\\\""))).map(_.mkString))
    // M keys: reserved statement fields; `origin` is excluded because
    // origin+eq re-routes to the dedicated Query slot on parse (by design)
    val mKeys = Seq("entity_id", "canonical_id", "dataset", "bucket",
      "prop", "value", "lang", "external", "fragment", "id")
    val binOps: Seq[Comparator] =
      Seq(EqOp, NotOp, GtOp, GteOp, LtOp, LteOp, LikeOp)
    val genLeafParts: Gen[(Comparator, Seq[String])] = Gen.frequency(
      5 -> (for { op <- Gen.oneOf(binOps); v <- genValue } yield (op, Seq(v))),
      3 -> (for {
        op <- Gen.oneOf(InOp, NotInOp)
        n <- Gen.choose(1, 5)
        vs <- Gen.listOfN(n, genValue)
      } yield (op, vs)),
      1 -> Gen.oneOf(NullOp, NotNullOp).map(op => (op, Seq.empty[String])))
    val genM: Gen[M] = for {
      k <- Gen.oneOf(mKeys)
      (op, vs) <- genLeafParts
    } yield M(k, op, vs)
    // P keys get a "p_" prefix so a random key can never collide with a
    // reserved field (which would re-route to an M on parse)
    val genP: Gen[P] = for {
      k <- genValue.map("p_" + _)
      (op, vs) <- genLeafParts
    } yield P(k, op, vs)
    val genQuery: Gen[Query] = for {
      origin <- Gen.option(genValue)
      schemata <- Gen.option(genValue)
      nm <- Gen.choose(0, 5); ms <- Gen.listOfN(nm, genM)
      np <- Gen.choose(0, 5); ps <- Gen.listOfN(np, genP)
    } yield Query(schemata = schemata, origin = origin,
      statementFilters = ms, propFilters = ps)
    samples(genQuery, 1000).foreach { q =>
      val wire = Rql.render(q)
      val back = Rql.parse(wire)
      assert(back == q, s"round-trip broke\n  q:    $q\n  wire: $wire\n  back: $back")
    }
    // sibling sort/slice fields ride OUTSIDE the wire string: parse with
    // them must equal applySiblings over the round-tripped filter tree
    // (first value's '-' prefix sets the direction for every column)
    val genSiblings = for {
      q <- genQuery
      nOrd <- Gen.choose(0, 3)
      cols <- Gen.listOfN(nOrd, Gen.alphaLowerStr.map(_.take(5)).suchThat(_.nonEmpty))
      desc <- Gen.oneOf(true, false)
      limit <- Gen.option(Gen.choose(1, 500))
      offset <- Gen.choose(0, 50)
    } yield (q, cols.map(c => if (desc) s"-$c" else c), limit, offset)
    samples(genSiblings, 300).foreach { case (q, orderBy, limit, offset) =>
      val back = Rql.parse(Rql.render(q), orderBy, limit, offset)
      val want = Rql.applySiblings(q, orderBy, limit, offset)
      assert(back == want, s"siblings broke: $orderBy $limit $offset\n  $back\n  $want")
    }
  }

  test("stripNamespace column twin agrees with the scala function") {
    import spark.implicits._
    val genId = Gen.listOfN(8,
      Gen.frequency(4 -> Gen.alphaNumChar, 1 -> Gen.const('.'))).map(_.mkString)
    val ids = samples(Gen.listOfN(30, genId), 5).flatten.distinct
    val got = ids.toDF("id")
      .select(col("id"), graft.functions.F.stripNamespace(col("id")).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    ids.foreach { id =>
      assert(got(id) == graft.ops.Explode.stripNamespace(id), s"mismatch for '$id'")
    }
  }

  test("TokenHash equals the composed md5-prefix recipe on random strings") {
    import spark.implicits._
    val genS = Gen.listOfN(12, Gen.frequency(
      6 -> Gen.alphaNumChar, 1 -> Gen.const(' '), 1 -> Gen.oneOf('é', '中', 'ß')))
      .map(_.mkString)
    val ss = samples(Gen.listOfN(40, genS), 5).flatten.distinct
    val rows = ss.toDF("s").select(
      graft.functions.TokenHash(col("s")).as("fused"),
      conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long").as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(r.getLong(0) >= 0L && r.getLong(0) <= 0xffffffffL)
    }
  }

  test("xref candidates: raising minShared only shrinks the pair set") {
    import spark.implicits._
    val genKey = for {
      b <- Gen.choose(0, 15); id <- Gen.choose(0, 9)
    } yield (s"b$b", s"e$id")
    val keys = samples(Gen.listOfN(120, genKey), 3).flatten.distinct.toDF("block", "id")
    def pairsAt(m: Int) = graft.ops.Xref.candidates(keys, "block", "id", maxBlock = 100, minShared = m)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val p1 = pairsAt(1); val p2 = pairsAt(2); val p3 = pairsAt(3)
    assert(p3.subsetOf(p2) && p2.subsetOf(p1))
    // ordering invariant: id_a < id_b always
    assert(p1.forall { case (a, b) => a < b })
  }

  test("semanticDedup matches a plain scala reference on random vector sets") {
    import spark.implicits._
    import graft.similarity.Similarity
    // components on a /100 grid so the ×10000 quantization is exact in
    // both float and double arithmetic (no rounding-mode edge cases)
    val genVec = Gen.listOfN(4, Gen.choose(-500, 500).map(_ / 100f))
      .suchThat(_.exists(_ != 0f))
    val nlist = 3
    val threshold = 0.8
    samples(Gen.listOfN(8, genVec), 5).foreach { vecs0 =>
      val vecs = vecs0.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val got = Similarity.semanticDedup(
        vecs.toDF("vec_id", "embedding"), "vec_id", nlist, threshold)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap

      // reference twin: same quantization, argmax-cosine assignment with
      // (sim desc, cid asc) tie-break, drop-if-similar-to-any-lower-id
      val q = vecs.map { case (id, v) =>
        id -> v.map(x => math.round(x.toDouble * 10000)).toArray
      }.toMap
      val n = q.map { case (id, a) => id -> a.map(x => x * x).sum }
      def cos(a: Long, b: Long) = Similarity.cosineOf(q(a), q(b), n(a), n(b))
      val cents = vecs.map(_._1).filter(_ < nlist)
      val cluster = vecs.map { case (id, _) =>
        id -> cents.maxBy(c => (cos(id, c), -c))
      }.toMap
      val expected = vecs.map { case (id, _) =>
        val dropped = vecs.map(_._1).exists(o =>
          o < id && cluster(o) == cluster(id) && cos(o, id) > threshold)
        id -> ((cluster(id), !dropped))
      }.toMap
      assert(got == expected, s"vectors: $vecs")
    }
  }

  test("boilerplateScrub with an infinite cap is the identity reassembly") {
    import spark.implicits._
    // random word-soup docs: with maxDocFreq above the corpus size no
    // span can be hot, so chunk → reassemble must reproduce every text
    // verbatim (the chunking/ordering/concat path has no lossy step)
    val genDoc = for {
      n <- Gen.choose(1, 17)
      ws <- Gen.listOfN(n, Gen.oneOf("a", "bb", "ccc", "d1", "e", "ff"))
    } yield ws.mkString(" ")
    val docs = samples(genDoc, 40).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = graft.dedupe.Dedupe
      .boilerplateScrub(docs, "doc_id", "text", span = 3, maxDocFreq = Long.MaxValue)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    val want = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == want.keySet)
    want.foreach { case (id, t) =>
      assert(out(id) == ((0L, t)), s"doc $id")
    }
  }

  test("RQL quoted literals round-trip arbitrary value bytes") {
    import graft.query.{FtmQuery, Rql}
    // any printable value (delimiters, quotes, backslashes included)
    // must survive render-quote → parse
    def quote(v: String) =
      "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val genVal = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(',', '(', ')', '"', '\'', '\\', ' ', ':')))
      .map(_.mkString)
    samples(genVal, 60).filter(_.nonEmpty).foreach { v =>
      val q = Rql.parse(s"eq(name,${quote(v)})")
      assert(q.propFilters == Seq(FtmQuery.P("name", FtmQuery.EqOp, Seq(v))), v)
    }
  }

  test("RQL parser total: junk input parses or fails IllegalArgumentException, nothing else") {
    import graft.query.Rql
    val genJunk = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar,
      Gen.oneOf('(', ')', ',', '"', '\'', '\\', ' ', ':', '-', '_', '.')))
      .map(_.mkString)
    samples(genJunk, 300).foreach { s =>
      try { Rql.parse(s); () } catch {
        case _: IllegalArgumentException => ()
        case e: Throwable => fail(s"unexpected ${e.getClass.getName} on: `$s`")
      }
    }
  }

  test("QuantizedCosine column agrees with the scala twin on random vectors") {
    import spark.implicits._
    val genVec = Gen.listOfN(6, Gen.choose(-10000L, 10000L)).map(_.toArray)
      .suchThat(_.exists(_ != 0L))
    val pairs = samples(Gen.zip(genVec, genVec), 20)
    val df = pairs.toDF("a", "b")
      .withColumn("na", graft.similarity.Similarity.dotQ(col("a"), col("a")))
      .withColumn("nb", graft.similarity.Similarity.dotQ(col("b"), col("b")))
    val got = df.select(graft.functions.QuantizedCosine(
      col("a"), col("b"), col("na"), col("nb"))).collect().map(_.getDouble(0))
    val expected = pairs.map { case (a, b) =>
      graft.similarity.Similarity.cosineOf(a, b,
        a.map(x => x * x).sum, b.map(x => x * x).sum)
    }
    assert(got.toSeq == expected.toSeq)
  }

  test("incremental xref equals the full recompute restricted to touched pairs") {
    import spark.implicits._
    import graft.ops.Xref
    // random key tables + random changed subsets, with maxBlock small
    // enough that the over-cap drop path fires: the dirty-block shortcut
    // must equal the full recompute on every touched pair (the proof in
    // Xref.incrementalScoredFromLive, exercised on arbitrary data)
    val genRow = for {
      b <- Gen.choose(0, 12); e <- Gen.choose(0, 25)
    } yield (s"b$b", s"e$e")
    val genData = Gen.zip(
      Gen.listOfN(140, genRow),
      Gen.listOfN(6, Gen.choose(0, 25).map(e => s"e$e")))
    samples(genData, 4).foreach { case (rows, changedIds) =>
      val live = rows.toDF("value", "entity_id")
        .withColumn("prop", org.apache.spark.sql.functions.lit("p"))
      val changed = changedIds.distinct.toDF("entity_id")
      val inc = Xref.incrementalScoredFromLive(live, changed, Seq("p"),
          maxBlock = 5, minShared = 2)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val changedSet = changedIds.toSet
      val full = Xref.scoredFromLive(live, Seq("p"),
          maxBlock = 5, minShared = 2)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .filter(t => changedSet(t._1) || changedSet(t._2)).toSet
      assert(inc == full, s"changed=$changedSet")
    }
  }

  test("Int8Cosine agrees with a scala twin; SQ8 quantization is scale-invariant") {
    import spark.implicits._
    // Seq[Byte], not Array[Byte]: the latter encodes as BINARY, while the
    // engine's quantize8 output is array<tinyint>
    val genVec = Gen.listOfN(6, Gen.choose(-127, 127).map(_.toByte))
      .map(_.toSeq).suchThat(_.exists(_ != 0))
    val pairs = samples(Gen.zip(genVec, genVec), 20)
    val df = pairs.toDF("a", "b")
      .withColumn("na", graft.similarity.Similarity.dot8(col("a"), col("a")))
      .withColumn("nb", graft.similarity.Similarity.dot8(col("b"), col("b")))
    val got = df.select(graft.functions.Int8Cosine(
      col("a"), col("b"), col("na"), col("nb"))).collect().map(_.getDouble(0))
    val expected = pairs.map { case (a, b) =>
      val dot = a.zip(b).map { case (x, y) => x.toLong * y.toLong }.sum
      val na = a.map(x => x.toLong * x.toLong).sum
      val nb = b.map(x => x.toLong * x.toLong).sum
      dot.toDouble / math.sqrt((na * nb).toDouble)
    }
    assert(got.toSeq == expected.toSeq)

    // scale invariance: a vector and its 3× copy quantize to the SAME
    // int8 codes (max-abs scaling divides the multiple out)
    val vecs = Seq(
      (1L, Array(0.1f, -0.5f, 0.25f)),
      (2L, Array(0.3f, -1.5f, 0.75f))).toDF("vec_id", "embedding")
    val codes = vecs
      .select(col("vec_id"), graft.similarity.Similarity.quantize8(col("embedding")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(codes(1L) == codes(2L))
  }

  test("triangleCounts equals brute-force enumeration on random graphs") {
    import spark.implicits._
    // random simple graphs on ≤12 nodes — dense enough to have triangles,
    // small enough for the O(n³) reference
    val genEdges = Gen.listOf(Gen.zip(Gen.choose(0L, 11L), Gen.choose(0L, 11L)))
    for (raw <- samples(genEdges, 12)) {
      val edges = raw.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.distinct
      if (edges.nonEmpty) {
        val got = graft.graph.EntityGraph.triangleCounts(
          edges.toDF("src", "dst"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val es = edges.toSet
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val want = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        for {
          a <- nodes; b <- nodes if b > a && es((a, b))
          c <- nodes if c > b && es((b, c)) && es((a, c))
        } { want(a) += 1; want(b) += 1; want(c) += 1 }
        assert(got === want.toMap, s"edges: $edges")
      }
    }
  }

  test("journal wire parser is total: junk parses or IllegalArgumentException") {
    // the same totality contract as the RQL parser: any byte junk from
    // the network must map to a clean 400, never an NPE/ClassCast/OOM
    val genJunk = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue)).map(_.mkString),
      Gen.oneOf("{", "}", "[]", "null", "123", "\"str\"",
        """{"entity_id":null}""", """{"entity_id":"e"}""",
        """{"entity_id":"e","prop":"p","value":"v","origin":"../x"}""",
        """{"entity_id":"e","prop":"p","value":"v","first_seen":"junk"}"""))
    for (s <- samples(genJunk, 300)) {
      try graft.api.JournalWire.parseRow(s, "ds")
      catch { case _: IllegalArgumentException => () }
    }
    // a fully-formed row still parses with recomputed defaults
    val ok = graft.api.JournalWire.parseRow(
      """{"entity_id":"e1","prop":"name","value":"Ann","prop_type":"name"}""", "ds")
    assert(ok.entity_id == "e1" && ok.origin == "bulk" && ok.dataset == "ds")
  }

  test("BPE merge round is lossless and greedy on random token streams") {
    import spark.implicits._
    // small alphabet forces repeats (and runs of equal tokens, the
    // overlap-parity edge the windows encode)
    val genDoc = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c"))
    val docs = samples(genDoc, 30).zipWithIndex.map { case (ws, i) =>
      (i.toLong, ws)
    }
    val toks = docs.flatMap { case (id, ws) =>
      ws.zipWithIndex.map { case (w, p) => (id, p + 1, w) }
    }.toDF("doc_id", "pos", "w")
    val (merged, top) = graft.text.Bpe.mergeRound(toks)
    val (a, b, _) = top.select("a", "b", "n_pair")
      .as[(String, String, Long)].head()
    val got = merged.orderBy("doc_id", "pos").as[(Long, Int, String)]
      .collect().groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toList).toMap
    // reference: sequential greedy scan per doc
    def greedy(ws: List[String]): List[String] = ws match {
      case x :: y :: rest if x == a && y == b => s"$x+$y" :: greedy(rest)
      case x :: rest => x :: greedy(rest)
      case Nil => Nil
    }
    for ((id, ws) <- docs) {
      val want = greedy(ws)
      assert(got(id) == want, s"doc $id: ${got(id)} != $want (pair $a $b)")
      // losslessness: splitting merged tokens on '+' reconstructs the doc
      assert(got(id).flatMap(_.split('+')) == ws)
    }
  }
}
