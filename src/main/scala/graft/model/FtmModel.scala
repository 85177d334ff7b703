package graft.model

/** FollowTheMoney ontology: the schema inheritance lattice, property→type
  * map, caption-property lists, and schema→bucket routing the engine needs
  * (reference consumes the `followthemoney` library for this — SURVEY.md
  * §1.3; bucket routing docs/architecture.md:99).
  *
  * The DATA lives in the versioned resource `graft/ftm-model.tsv` — a
  * snapshot of the published FtM model (~60 schemata: legal entities,
  * assets like Vessel/Airplane/Security, relationship intervals like
  * Sanction/Passport/Directorship, the document tree) — so extending the
  * ontology is a data edit, never code. This object is the loader plus the
  * lattice algorithms. Driver-side lookup maps only — broadcast-friendly,
  * no Catalyst involvement.
  */
object FtmModel {

  // resource lines, tab-split, comments/blanks dropped — parsed once at
  // class init and held as plain maps for the life of the JVM
  private val modelLines: List[Array[String]] = {
    val in = getClass.getResourceAsStream("/graft/ftm-model.tsv")
    require(in != null, "FtM model resource graft/ftm-model.tsv missing from classpath")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map(_.split("\t", -1)).toList
    finally in.close()
  }

  /** Model snapshot version (the resource's `# version:` header). */
  val modelVersion: String = {
    val in = getClass.getResourceAsStream("/graft/ftm-model.tsv")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .collectFirst { case l if l.startsWith("# version:") => l.stripPrefix("# version:").trim }
      .getOrElse("unversioned")
    finally in.close()
  }

  /** schema → parent schemas (multiple inheritance, like FtM). */
  val parents: Map[String, Seq[String]] = modelLines.collect {
    case a if a(0) == "S" =>
      a(1) -> (if (a.length > 2) a(2).split(',').filter(_.nonEmpty).toSeq else Seq.empty)
  }.toMap

  /** All ancestors of a schema including itself. */
  def ancestors(schema: String): Set[String] = {
    def walk(s: String, acc: Set[String]): Set[String] =
      if (acc(s)) acc
      else parents.getOrElse(s, Seq.empty).foldLeft(acc + s)((a, p) => walk(p, a))
    walk(schema, Set.empty)
  }

  /** All schemas that are-a `schema` (descendant expansion, reference P3). */
  def descendants(schema: String): Set[String] =
    parents.keySet.filter(s => ancestors(s).contains(schema))

  /** Most specific schema of a set: one whose ancestor set contains every
    * other member. Falls back to the least common ancestor when the set is
    * incomparable (reference logic/entities/aggregate.py:19-28).
    */
  def mostSpecific(schemas: Set[String]): String = {
    if (schemas.isEmpty) return "Thing"
    if (schemas.size == 1) return schemas.head
    schemas.find(s => schemas.forall(o => ancestors(s).contains(o))) match {
      case Some(s) => s
      case None =>
        val common = schemas.map(ancestors).reduce(_ intersect _)
        if (common.isEmpty) "Thing"
        // deepest common ancestor; break ties by name for determinism
        else common.toSeq.sortBy(s => (-ancestors(s).size, s)).head
    }
  }

  /** Per-schema caption declarations (first populated property wins —
    * reference schema.caption via logic/entities/aggregate.py:134-137;
    * lists mirror the published FtM model's caption fields; data from the
    * versioned resource).
    */
  private val ownCaption: Map[String, Seq[String]] = modelLines.collect {
    case a if a(0) == "S" && a.length > 3 && a(3).nonEmpty =>
      a(1) -> a(3).split(',').filter(_.nonEmpty).toSeq
  }.toMap

  /** Caption properties in preference order for a schema: the schema's own
    * declaration, else the nearest ancestor's (breadth-first up the
    * lattice), else the default `name`.
    */
  def captionProps(schema: String): Seq[String] = {
    @annotation.tailrec
    def bfs(frontier: Seq[String], seen: Set[String]): Seq[String] =
      frontier.flatMap(ownCaption.get) match {
        case hit +: _ => hit
        case _ =>
          val next = frontier.flatMap(s => parents.getOrElse(s, Seq.empty))
            .distinct.filterNot(seen)
          if (next.isEmpty) Seq("name") else bfs(next, seen ++ next)
      }
    bfs(Seq(schema), Set(schema))
  }

  /** Coarse physical bucket for a schema (partition routing). */
  def bucketOf(schema: String): String = {
    val a = ancestors(schema)
    if (schema == "Page") "page"
    else if (schema == "Pages") "pages"
    else if (schema == "Mention") "mention"
    else if (a.contains("Document")) "document"
    else if (a.contains("Thing")) "thing"
    else "interval"
  }

  /** Property → FtM type name (drives `prop_type` and lang nulling).
    * Global best-effort map from the versioned resource; unknown
    * properties default to `string` exactly like before.
    */
  val propTypes: Map[String, String] = modelLines.collect {
    case Array("P", prop, tpe) => prop -> tpe
  }.toMap.withDefaultValue("string")

  /** Types whose values carry no language (lang gets nulled on import). */
  val nonLinguistic: Set[String] =
    Set("date", "country", "email", "checksum", "entity", "mimetype",
      "number", "url", "identifier", "phone", "gender", "language", "topic",
      "iban", "ip", "json")

  /** Columnar twin of [[schemaForMime]] for statement-volume routing. */
  def schemaForMimeCol(mime: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    when(mime.startsWith("image/"), "Image")
      .when(mime.startsWith("audio/"), "Audio")
      .when(mime.startsWith("video/"), "Video")
      .when(mime === "application/pdf", "Pages")
      .when(mime === "text/html", "HyperText")
      .when(mime === "application/vnd.ms-excel" || mime === "text/csv", "Table")
      .when(mime.startsWith("text/"), "PlainText")
      .when(mime === "message/rfc822", "Email")
      .when(mime === "inode/directory", "Folder")
      .otherwise("Document")
  }

  /** mimetype → document schema routing (reference helpers/file.py:64-100). */
  def schemaForMime(mime: String): String = mime match {
    case m if m.startsWith("image/") => "Image"
    case m if m.startsWith("audio/") => "Audio"
    case m if m.startsWith("video/") => "Video"
    case "application/pdf" => "Pages"
    case "text/html" => "HyperText"
    // Table before the text/ prefix: text/csv routes to Table
    // (reference MIME_SCHEMAS checks the CSV family first)
    case "application/vnd.ms-excel" | "text/csv" => "Table"
    case m if m.startsWith("text/") => "PlainText"
    case "message/rfc822" => "Email"
    case "inode/directory" => "Folder"
    case _ => "Document"
  }
}
