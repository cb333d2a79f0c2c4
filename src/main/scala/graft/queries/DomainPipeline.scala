package graft.queries

import graft.Tables
import graft.ops.{Extract, Facts, Scd2}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** End-to-end replay of the reference's 3-entity domain pipeline — the
  * composed star build, not just its operators in isolation.
  *
  * The reference ingests three API entities (character / location /
  * episode) as verbatim JSON payloads, flattens them into typed staging
  * tables plus four URL-link tables, loads SCD2 dimensions (with a
  * seeded `-1` unknown member for locations — configure.py:280-300), and
  * builds two bridge facts:
  *
  *  - `fact_char_loc` (dwh_fact_charer_location.py:60-133): union of the
  *    character-side links (origin + last role, stg_character.py:99-146)
  *    and the location-side `residents` links (stg_location.py:83-96),
  *    resolved through the disjunctive unknown-member join
  *    (`url = url OR (url IS NULL AND id = -1)`) and a static role
  *    dimension (configure.py:309-328).
  *  - `fact_char_ep` (dwh_fact_character_episode.py:45-113): union of the
  *    character→episodes array (stg_character.py:165-171) and the
  *    episode→characters array (stg_episode.py:75-96), resolved through
  *    both dims with an incremental anti-join.
  *
  * Here the domain is synthesized deterministically from the TPC-H-ish
  * tables (customer → characters, supplier → locations, part → episodes)
  * so DuckDB can replay the SAME star from the base tables by pure
  * arithmetic — the Spark side must round-trip through the full
  * raw-JSON → staging → dwh path and land on the identical rows, proving
  * every layer of the extraction.
  *
  * Scale shape: raw/stg layers are map-only over the entity tables
  * (one `from_json` per payload); dims broadcast into the fact joins;
  * the unknown-member join is the synthetic-equi-key hash join
  * ([[Facts.joinWithUnknownMember]], never BroadcastNestedLoopJoin);
  * surrogate keys come from [[Scd2.withScalableSk]] (no single-partition
  * sort); the only driver-side values are the three bounded entity
  * counts that parameterize the synthetic link arithmetic.
  */
object DomainPipeline {

  private val RunTs = "2024-02-01 00:00:00"

  // entity URL schemes — injective over ids, so URL equality ⟺ id equality
  private def charUrl(id: Column): Column =
    concat(lit("https://ex.api/character/"), id.cast("string"))
  private def locUrl(id: Column): Column =
    concat(lit("https://ex.api/location/"), id.cast("string"))
  private def epUrl(id: Column): Column =
    concat(lit("https://ex.api/episode/"), id.cast("string"))

  /** raw.character: the whole API JSON verbatim (configure.py:58-62) —
    * nested origin/location objects + the episode URL array
    * (stg_character.py:107-108,131-132,165-171). Characters whose id is a
    * multiple of 10 have an EMPTY origin url (present, not null): the
    * reference's NULLIF(TRIM(..)) turns those into NULL link targets that
    * must resolve to the unknown member. */
  private def rawCharacter(s: SparkSession, d: String, nLoc: Long, nEp: Long): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey").as("source_id"),
      to_json(struct(
        col("c_custkey").as("id"),
        col("c_name").as("name"),
        col("c_mktsegment").as("status"),
        when(col("c_custkey") % 7 === 0, lit("Alien")).otherwise(lit("Human")).as("species"),
        when(col("c_custkey") % 2 === 0, lit("Female")).otherwise(lit("Male")).as("gender"),
        concat(lit("https://ex.api/avatar/"), col("c_custkey").cast("string"), lit(".jpeg")).as("image"),
        charUrl(col("c_custkey")).as("url"),
        struct(
          when(col("c_custkey") % 10 === 0, lit("unknown"))
            .otherwise(concat(lit("Loc "), ((col("c_custkey") * 3) % nLoc + 1).cast("string"))).as("name"),
          when(col("c_custkey") % 10 === 0, lit(""))
            .otherwise(locUrl((col("c_custkey") * 3) % nLoc + 1)).as("url")).as("origin"),
        struct(
          concat(lit("Loc "), (col("c_custkey") % nLoc + 1).cast("string")).as("name"),
          locUrl(col("c_custkey") % nLoc + 1).as("url")).as("location"),
        array(
          epUrl(col("c_custkey") % nEp + 1),
          epUrl((col("c_custkey") * 5 + 3) % nEp + 1)).as("episode"))).as("payload"))

  /** raw.location with the `residents` character-URL array
    * (stg_location.py:83-96). */
  private def rawLocation(s: SparkSession, d: String, nChar: Long): DataFrame =
    Tables.supplier(s, d).select(
      col("s_suppkey").as("source_id"),
      to_json(struct(
        col("s_suppkey").as("id"),
        concat(lit("Loc "), col("s_suppkey").cast("string")).as("name"),
        when(col("s_suppkey") % 3 === 0, lit("Planet")).otherwise(lit("Space station")).as("type"),
        concat(lit("Dimension C-"), (col("s_suppkey") % 4).cast("string")).as("dimension"),
        locUrl(col("s_suppkey")).as("url"),
        array(
          charUrl(col("s_suppkey") % nChar + 1),
          charUrl((col("s_suppkey") * 11 + 7) % nChar + 1)).as("residents"))).as("payload"))

  /** raw.episode with the `characters` URL array and the
    * 'Month DD, YYYY' air_date text (stg_episode.py:46-53); every 100th
    * episode carries malformed date text to exercise the regex guard. */
  private def rawEpisode(s: SparkSession, d: String, nChar: Long): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey").as("source_id"),
      to_json(struct(
        col("p_partkey").as("id"),
        col("p_name").as("name"),
        concat(lit("S"), (col("p_partkey") % 6 + 1).cast("string"),
          lit("E"), (col("p_partkey") % 11 + 1).cast("string")).as("episode"),
        when(col("p_partkey") % 100 === 0, lit("unknown date"))
          .otherwise(date_format(
            date_add(lit("2008-01-06").cast("date"), (col("p_partkey") % 365).cast("int")),
            "MMMM d, yyyy")).as("air_date"),
        epUrl(col("p_partkey")).as("url"),
        array(
          charUrl(col("p_partkey") % nChar + 1),
          charUrl((col("p_partkey") * 13 + 5) % nChar + 1)).as("characters"))).as("payload"))

  private val CharSchema = StructType.fromDDL(
    "id BIGINT, name STRING, status STRING, species STRING, gender STRING, " +
      "image STRING, url STRING, origin STRUCT<name: STRING, url: STRING>, " +
      "location STRUCT<name: STRING, url: STRING>, episode ARRAY<STRING>")
  private val LocSchema = StructType.fromDDL(
    "id BIGINT, name STRING, type STRING, dimension STRING, url STRING, residents ARRAY<STRING>")
  private val EpSchema = StructType.fromDDL(
    "id BIGINT, name STRING, episode STRING, air_date STRING, url STRING, characters ARRAY<STRING>")

  /** All seven staging tables of the reference (3 entities + 4 link
    * tables), extracted with ONE from_json per payload. Parsed payloads
    * are lazily localCheckpointed: several staging branches read each
    * entity's parse (entity + link tables), and without materialization
    * every branch would re-build and re-parse the JSON; laziness keeps a
    * query that never touches an entity from paying for it. */
  private final class Stg(s: SparkSession, d: String,
      nChar: Long, nLoc: Long, nEp: Long) {

    private lazy val pc = rawCharacter(s, d, nLoc, nEp)
      .select(from_json(col("payload"), CharSchema).as("j"))
      .localCheckpoint()
    private lazy val pl = rawLocation(s, d, nChar)
      .select(from_json(col("payload"), LocSchema).as("j"))
      .localCheckpoint()
    private lazy val pe = rawEpisode(s, d, nChar)
      .select(from_json(col("payload"), EpSchema).as("j"))
      .localCheckpoint()

    // stg.character (stg_character.py:50-62)
    lazy val character: DataFrame = pc.select(
      col("j.id").as("id"), col("j.name").as("name"), col("j.status").as("status"),
      col("j.species").as("species"), col("j.gender").as("gender"),
      col("j.image").as("image"), col("j.url").as("url"))

    // stg.location_ch — 'last' + 'origin' roles, filtered on the RAW url
    // being present, stored through NULLIF(TRIM(..)) (stg_character.py:
    // 99-146): an empty-string origin url survives the filter but stores
    // as NULL → unknown-member link
    lazy val locationCh: DataFrame =
      pc.filter(col("j.location.url").isNotNull).select(
          col("j.id").as("id"), col("j.location.name").as("name"),
          Extract.nullifEmpty(col("j.location.url")).as("url"), lit("last").as("role"))
        .unionByName(
          pc.filter(col("j.origin.url").isNotNull).select(
            col("j.id").as("id"), col("j.origin.name").as("name"),
            Extract.nullifEmpty(col("j.origin.url")).as("url"), lit("origin").as("role")))

    // stg.episode_ch — jsonb_array_elements_text + PK(id,url) dedup
    // (stg_character.py:152-171: ON CONFLICT DO NOTHING)
    lazy val episodeCh: DataFrame = pc.select(col("j.id").as("id"), explode(col("j.episode")).as("url"))
      .distinct()

    // stg.location (stg_location.py:24-68)
    lazy val location: DataFrame = pl.select(
      col("j.id").as("id"), col("j.name").as("name"), col("j.type").as("type"),
      col("j.dimension").as("dimension"), col("j.url").as("url"))

    // stg.character_loc — residents array (stg_location.py:70-96)
    lazy val characterLoc: DataFrame = pl.select(col("j.id").as("id"), explode(col("j.residents")).as("url"))
      .distinct()

    // stg.episode with the regex-guarded 'Month DD, YYYY' parse
    // (stg_episode.py:40-53)
    lazy val episode: DataFrame = pe.select(
      col("j.id").as("id"), col("j.name").as("name"), col("j.episode").as("episode"),
      Extract.guardedDate(col("j.air_date")).as("air_date"), col("j.url").as("url"))

    // stg.character_ep — characters array (stg_episode.py:75-96)
    lazy val characterEp: DataFrame = pe.select(col("j.id").as("id"), explode(col("j.characters")).as("url"))
      .distinct()
  }

  private def stage(s: SparkSession, d: String, nChar: Long, nLoc: Long, nEp: Long): Stg =
    new Stg(s, d, nChar, nLoc, nEp)

  /** Initial SCD2 dimension load: one current version per key, surrogate
    * keys dense in bk order via the scalable assignment (M5). */
  private def initialDim(base: DataFrame, bk: String, sk: String): DataFrame =
    Scd2.withScalableSk(base, Seq(bk), sk)
      .withColumn("valid_from", lit(RunTs).cast("timestamp"))
      .withColumn("valid_to", Scd2.infinity)
      .withColumn("is_current", lit(true))

  def all: Seq[Q] = Seq(

    // ---- the character↔location star: both link sources, role dim,
    // unknown member, disjunctive resolution, incremental anti-join ----
    Q("pipe2_domain_star",
      (s, d) => {
        import s.implicits._
        // bounded entity counts parameterize the synthetic link arithmetic
        // (driver-side scalars over dimension-scale tables, like maxSk)
        val nChar = Tables.customer(s, d).count()
        val nLoc = Tables.supplier(s, d).count()
        val nEp = Tables.part(s, d).count()
        val stg = stage(s, d, nChar, nLoc, nEp)

        // dwh dims: characters, locations ∪ seeded unknown member
        // (configure.py:270-300: id -1, NULL url), static role dim
        val dimCharacter = initialDim(
          stg.character.select(col("id").as("character_id"), col("name"),
            col("url").as("character_url")),
          "character_id", "character_sk")
        val dimLocation = initialDim(
          stg.location.select(col("id").as("location_id"), col("url").as("location_url"))
            .unionByName(s.range(1).select(
              lit(-1L).as("location_id"), lit(null).cast("string").as("location_url"))),
          "location_id", "location_sk")
        val dimRole = Seq((1, "origin"), (2, "last")).toDF("role_id", "role_name")

        // source_1: character-side links; the reference re-applies
        // NULLIF(TRIM(..)) on the stored url (dwh_fact_charer_location.py:60-66)
        val src1 = stg.locationCh.select(
          col("id").as("character_id"),
          Extract.nullifEmpty(col("url")).as("location_url"),
          col("role"))
        // source_2: residents — resolve the character url and the location
        // id through staging (dwh_fact_charer_location.py:68-80)
        val src2 = stg.characterLoc.alias("cl")
          .join(stg.character.select(col("id").as("character_id"), col("url")).alias("c"),
            col("cl.url") === col("c.url"))
          .join(stg.location.select(col("id").as("lid"), col("url").as("location_url")).alias("l"),
            col("cl.id") === col("l.lid"))
          .select(col("character_id"), col("location_url"), lit("last").as("role"))

        val unified = Facts.unionDistinct(src1, src2)

        // resolve: equi character join, disjunctive location join (as the
        // synthetic-equi-key hash join), role name join — all broadcast
        val withChar = Facts.resolveFk(
          unified, dimCharacter.filter(col("is_current")),
          factKey = "character_id", dimBk = "character_id", dimSk = "character_sk",
          carry = Seq("name"))
        val withLoc = Facts.joinWithUnknownMember(
          withChar,
          dimLocation.filter(col("is_current"))
            .select(col("location_url"), col("location_id"), col("location_sk")),
          factKey = "location_url", dimNaturalKey = "location_url", dimId = "location_id")
        val resolved = withLoc
          .join(broadcast(dimRole), col("role") === col("role_name"))
          .select(col("character_id"), col("name"), col("character_sk"),
            col("location_id"), col("location_sk"), col("role_id"), col("role_name"))

        // incremental anti-join append into the (empty) fact (J4/M2)
        Facts.incrementalAppend(resolved.limit(0), resolved,
          Seq("character_sk", "location_sk", "role_id"))
      },
      Some("""WITH pars AS (
             |  SELECT (SELECT count(*) FROM customer) AS nc,
             |         (SELECT count(*) FROM supplier) AS nl
             |),
             |src1 AS (
             |  SELECT c_custkey AS character_id,
             |         'https://ex.api/location/' || CAST(c_custkey % nl + 1 AS VARCHAR) AS location_url,
             |         'last' AS role
             |  FROM customer, pars
             |  UNION ALL
             |  SELECT c_custkey,
             |         CASE WHEN c_custkey % 10 = 0 THEN NULL
             |              ELSE 'https://ex.api/location/' || CAST((c_custkey * 3) % nl + 1 AS VARCHAR) END,
             |         'origin'
             |  FROM customer, pars
             |),
             |res AS (
             |  SELECT s_suppkey AS lid, s_suppkey % nc + 1 AS rid FROM supplier, pars
             |  UNION ALL
             |  SELECT s_suppkey, (s_suppkey * 11 + 7) % nc + 1 FROM supplier, pars
             |),
             |src2 AS (
             |  SELECT c.c_custkey AS character_id,
             |         'https://ex.api/location/' || CAST(r.lid AS VARCHAR) AS location_url,
             |         'last' AS role
             |  FROM res r JOIN customer c ON c.c_custkey = r.rid
             |),
             |unified AS (
             |  SELECT DISTINCT character_id, location_url, role
             |  FROM (SELECT * FROM src1 UNION ALL SELECT * FROM src2)
             |),
             |dimc AS (
             |  SELECT c_custkey AS character_id, c_name AS name,
             |         CAST(row_number() OVER (ORDER BY c_custkey) AS BIGINT) AS character_sk
             |  FROM customer
             |),
             |diml AS (
             |  SELECT location_id,
             |         CAST(row_number() OVER (ORDER BY location_id) AS BIGINT) AS location_sk,
             |         location_url
             |  FROM (
             |    SELECT CAST(s_suppkey AS BIGINT) AS location_id,
             |           'https://ex.api/location/' || CAST(s_suppkey AS VARCHAR) AS location_url
             |    FROM supplier
             |    UNION ALL SELECT CAST(-1 AS BIGINT), NULL)
             |),
             |roles AS (SELECT * FROM (VALUES (1, 'origin'), (2, 'last')) AS t(role_id, role_name))
             |SELECT u.character_id, dc.name, dc.character_sk,
             |       dl.location_id, dl.location_sk, r.role_id, r.role_name
             |FROM unified u
             |JOIN dimc dc ON dc.character_id = u.character_id
             |JOIN diml dl
             |  ON (dl.location_url = u.location_url
             |      OR (u.location_url IS NULL AND dl.location_id = -1))
             |JOIN roles r ON r.role_name = u.role""".stripMargin)),

    // ---- the character↔episode bridge: both URL-array sources resolved
    // through staging, dims equi-joined, anti-join append ----
    Q("pipe3_domain_bridge",
      (s, d) => {
        val nChar = Tables.customer(s, d).count()
        val nLoc = Tables.supplier(s, d).count()
        val nEp = Tables.part(s, d).count()
        val stg = stage(s, d, nChar, nLoc, nEp)

        val dimCharacter = initialDim(
          stg.character.select(col("id").as("character_id"), col("url").as("character_url")),
          "character_id", "character_sk")
        val dimEpisode = initialDim(
          stg.episode.select(col("id").as("episode_id"),
            date_format(col("air_date"), "yyyy-MM-dd").as("air_date"),
            col("url").as("episode_url")),
          "episode_id", "episode_sk")

        // source_1: character → episodes, url-resolved against stg.episode
        // (dwh_fact_character_episode.py:47-55)
        val src1 = stg.episodeCh.alias("ec")
          .join(stg.episode.select(col("id").as("episode_id"), col("url")).alias("e"),
            col("ec.url") === col("e.url"))
          .select(col("ec.id").as("character_id"), col("episode_id"))
        // source_2: episode → characters, url-resolved against stg.character
        // (dwh_fact_character_episode.py:59-67)
        val src2 = stg.characterEp.alias("ce")
          .join(stg.character.select(col("id").as("character_id"), col("url")).alias("c"),
            col("ce.url") === col("c.url"))
          .select(col("character_id"), col("ce.id").as("episode_id"))

        val unified = Facts.unionDistinct(src1, src2)

        val resolved = Facts.resolveFk(
          Facts.resolveFk(unified, dimCharacter.filter(col("is_current")),
            factKey = "character_id", dimBk = "character_id", dimSk = "character_sk"),
          dimEpisode.filter(col("is_current")),
          factKey = "episode_id", dimBk = "episode_id", dimSk = "episode_sk",
          carry = Seq("air_date"))
          .select(col("character_id"), col("character_sk"),
            col("episode_id"), col("episode_sk"), col("air_date"))

        Facts.incrementalAppend(resolved.limit(0), resolved,
          Seq("character_sk", "episode_sk"))
      },
      Some("""WITH pars AS (
             |  SELECT (SELECT count(*) FROM customer) AS nc,
             |         (SELECT count(*) FROM part) AS ne
             |),
             |eps AS (
             |  SELECT c_custkey AS cid, c_custkey % ne + 1 AS eid FROM customer, pars
             |  UNION ALL
             |  SELECT c_custkey, (c_custkey * 5 + 3) % ne + 1 FROM customer, pars
             |),
             |src1 AS (
             |  SELECT e.cid AS character_id, p.p_partkey AS episode_id
             |  FROM eps e JOIN part p ON p.p_partkey = e.eid
             |),
             |chs AS (
             |  SELECT p_partkey AS eid, p_partkey % nc + 1 AS cid FROM part, pars
             |  UNION ALL
             |  SELECT p_partkey, (p_partkey * 13 + 5) % nc + 1 FROM part, pars
             |),
             |src2 AS (
             |  SELECT c.c_custkey AS character_id, h.eid AS episode_id
             |  FROM chs h JOIN customer c ON c.c_custkey = h.cid
             |),
             |unified AS (
             |  SELECT DISTINCT character_id, episode_id
             |  FROM (SELECT * FROM src1 UNION ALL SELECT * FROM src2)
             |),
             |dimc AS (
             |  SELECT c_custkey AS character_id,
             |         CAST(row_number() OVER (ORDER BY c_custkey) AS BIGINT) AS character_sk
             |  FROM customer
             |),
             |dime AS (
             |  SELECT p_partkey AS episode_id,
             |         CAST(row_number() OVER (ORDER BY p_partkey) AS BIGINT) AS episode_sk,
             |         CASE WHEN p_partkey % 100 = 0 THEN NULL
             |              ELSE strftime(DATE '2008-01-06' + CAST(p_partkey % 365 AS INT), '%Y-%m-%d') END AS air_date
             |  FROM part
             |)
             |SELECT u.character_id, dc.character_sk, u.episode_id, de.episode_sk, de.air_date
             |FROM unified u
             |JOIN dimc dc ON dc.character_id = u.character_id
             |JOIN dime de ON de.episode_id = u.episode_id""".stripMargin))
  )
}
