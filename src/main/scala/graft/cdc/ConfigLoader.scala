package graft.cdc

import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Loaded job configuration — the file-driven entry the reference is
  * run from (reference: internal/config.go:13-31 `LoadConfig`,
  * sslr.json). `replication` carries the per-table settings the
  * [[Replicator]] consumes; the rest are job-level knobs.
  *
  * Documented divergences from the reference file format:
  *  - `keys` (REQUIRED per table): primary keys + version column. The
  *    reference reads pkeys from the Postgres catalog and versions by
  *    `xmin`; file stores have neither, so the config declares them.
  *    `versionColumn` defaults to the first primary key (append-only
  *    feed).
  *  - `waitBetweenJobs` is in MILLISECONDS (Go's time.Duration JSON
  *    encoding is nanoseconds).
  *  - `targetBuckets` (optional, graft extension): > 0 lays the target
  *    out as a [[BucketedParquetStore]] with that many hash buckets —
  *    partition-pruned incremental writes.
  *  - `checkpointDir` (optional): staging/state dir for jdbc: targets.
  *  - `throttlePercentage` IS enforced, at job granularity: the CLI's
  *    continuous loop applies the reference's utilization-budget sleep
  *    between cycles (`Replicate.throttleWaitMs`). Default 80, like
  *    the reference; set 100 to disable.
  *  - `stateTable` and `minDeleteChunkSize` are accepted for config
  *    compatibility only: state lives at the sink's state path
  *    (checkpoint model), and the one-pass bucket diff has no
  *    recursion floor.
  */
case class GraftConfig(
    source: String,
    target: String,
    replication: ReplicationConfig,
    waitBetweenJobsMs: Long = 5000L,
    targetBuckets: Int = 0,
    checkpointDir: String = "",
    stateTable: String = "__sslr_state",
    throttlePercentage: Double = 80.0,
    minDeleteChunkSize: Long = 100L)

object ConfigLoader {

  private val topFields = Set(
    "source", "target", "tables", "filteredTables", "keys",
    "updateChunkSize", "deleteChunkSize", "minDeleteChunkSize", "copyChunks",
    "throttlePercentage", "stateTable", "syncUpdates", "syncDeletes",
    "resyncOnSchemaChange", "fullCopyThreshold", "waitBetweenJobs",
    "targetBuckets", "checkpointDir")
  private val filteredFields = Set("where", "wheres", "uses")
  private val keyFields = Set("primaryKeys", "versionColumn")

  def load(path: String): GraftConfig =
    parse(new ObjectMapper().readTree(new java.io.File(path)))

  def loadString(json: String): GraftConfig =
    parse(new ObjectMapper().readTree(json))

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  // Mirrors the reference's validateSource: every field must be known,
  // except "comment" keys starting with slash-star (config.go comment
  // hack — see the reference's own sslr.json).
  private def checkFields(node: JsonNode, valid: Set[String], what: String): Unit =
    node.fieldNames().asScala.foreach { f =>
      if (!f.startsWith("/*") && !valid.contains(f))
        fail(s"""Unknown $what setting "$f"""")
    }

  private def parse(root: JsonNode): GraftConfig = {
    checkFields(root, topFields, "")
    val source = Option(root.get("source")).map(_.asText())
      .getOrElse(fail("missing 'source'"))
    val target = Option(root.get("target")).map(_.asText())
      .getOrElse(fail("missing 'target'"))

    val plainTables = Option(root.get("tables")).toSeq
      .flatMap(_.elements().asScala).map(_.asText())
    val filtered = Option(root.get("filteredTables")).map { ft =>
      ft.properties().asScala
        .filterNot(_.getKey.startsWith("/*")) // comment hack applies at every level
        .map { e =>
        checkFields(e.getValue, filteredFields, "filtered table")
        val where = Option(e.getValue.get("where")).map(_.asText()).getOrElse("")
        val wheres = Option(e.getValue.get("wheres")).toSeq
          .flatMap(_.elements().asScala).map(_.asText())
        // reference validateUses: wheres is multi-line sugar for where;
        // setting both is ambiguous and rejected (config.go:139-145)
        if (wheres.nonEmpty && where.nonEmpty)
          fail(s"cannot set both 'where' and 'wheres' for table \"${e.getKey}\"")
        val joined = if (wheres.nonEmpty) wheres.mkString(" ") else where
        val uses = Option(e.getValue.get("uses")).toSeq
          .flatMap(_.elements().asScala).map(_.asText())
        e.getKey -> (joined, uses)
      }.toMap
    }.getOrElse(Map.empty[String, (String, Seq[String])])

    val allNames = plainTables ++ filtered.keys.toSeq.sorted
    // a table listed twice (or in both tables and filteredTables) would
    // silently spawn two concurrent sync jobs racing on one staging dir
    allNames.groupBy(identity).collect { case (n, occ) if occ.size > 1 => n }
      .headOption.foreach(n => fail(s"""table "$n" configured more than once"""))
    filtered.foreach { case (t, (_, uses)) =>
      uses.foreach(u =>
        if (!allNames.contains(u)) fail(s"""unknown table "$u" in uses list"""))
    }

    val keys = Option(root.get("keys")).map { ks =>
      checkFields(ks, allNames.toSet, "keys")
      ks.properties().asScala
        .filterNot(_.getKey.startsWith("/*"))
        .map { e =>
        checkFields(e.getValue, keyFields, "table keys")
        val pks = Option(e.getValue.get("primaryKeys")).toSeq
          .flatMap(_.elements().asScala).map(_.asText())
        if (pks.isEmpty) fail(s"""empty primaryKeys for table "${e.getKey}"""")
        val ver = Option(e.getValue.get("versionColumn")).map(_.asText())
          .getOrElse(pks.head)
        e.getKey -> (pks.toSeq, ver)
      }.toMap
    }.getOrElse(Map.empty[String, (Seq[String], String)])

    val tableConfigs = allNames.map { name =>
      val (pks, ver) = keys.getOrElse(name,
        fail(s"""missing "keys" entry for table "$name" (primaryKeys required)"""))
      val (where, uses) = filtered.getOrElse(name, ("", Nil))
      TableConfig(name, pks, ver,
        where = Option(where).filter(_.nonEmpty), uses = uses)
    }

    def num(f: String, d: Long): Long = Option(root.get(f)).map(_.asLong(d)).getOrElse(d)
    def dbl(f: String, d: Double): Double = Option(root.get(f)).map(_.asDouble(d)).getOrElse(d)
    def bool(f: String, d: Boolean): Boolean = Option(root.get(f)).map(_.asBoolean(d)).getOrElse(d)

    GraftConfig(
      source = source,
      target = target,
      replication = ReplicationConfig(
        tables = tableConfigs,
        fullCopyThreshold = dbl("fullCopyThreshold", 0.5),
        syncUpdates = bool("syncUpdates", true),
        syncDeletes = bool("syncDeletes", true),
        resyncOnSchemaChange = bool("resyncOnSchemaChange", false),
        updateChunkSize = num("updateChunkSize", 1000L).toInt,
        deleteChunkSize = num("deleteChunkSize", 1000L),
        copyChunks = num("copyChunks", 0L).toInt),
      waitBetweenJobsMs = num("waitBetweenJobs", 5000L),
      targetBuckets = num("targetBuckets", 0L).toInt,
      checkpointDir = Option(root.get("checkpointDir")).map(_.asText()).getOrElse(""),
      stateTable = Option(root.get("stateTable")).map(_.asText()).getOrElse("__sslr_state"),
      throttlePercentage = dbl("throttlePercentage", 80.0),
      minDeleteChunkSize = num("minDeleteChunkSize", 100L))
  }
}
