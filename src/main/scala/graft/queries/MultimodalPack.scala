package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}
import graft.multimodal.Multimodal

/** Multimodal binary-column operators (builder-prompt training-data ops).
  * m1 metadata math is oracle-checked (byte lengths are engine-agnostic);
  * m2's decode metadata is oracle-checked too (the stub decode is integer
  * arithmetic on byte length, which SQL reproduces — the fixture text is
  * pure ASCII, so strlen = octet count); the float feature VECTORS stay
  * spec-pinned (MultimodalSpec) since their float32 fold order is
  * engine-specific.
  */
object MultimodalPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary column + typed metadata: byte length and stub decode
    // dimensions, all arithmetic on octet length → oracle-checkable.
    "m1_binary_meta" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("content", col("text").cast("binary"))
        .withColumn("n_bytes", length(col("content")))
        .withColumn("width", pmod(col("n_bytes"), lit(64)) + 1)
        .withColumn("height", pmod((col("n_bytes") / 64).cast("int"), lit(64)) + 1)
        .select("doc_id", "n_bytes", "width", "height")),

    // mapPartitions decode/featurize plumbing (stubbed codec). The decode
    // metadata (dims, frame count, feature width) is driver-checked; the
    // feature values are spec-pinned.
    "m2_media_features" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(s, Tables.documents(s, dir))
      Multimodal.decodeAndFeaturize(s, media).toDF()
        .select(col("media_id"), col("media_type"), col("n_bytes"),
          col("width"), col("height"), col("n_frames"),
          size(col("features")).as("feature_dim"))
    }),

    // Media perceptual-hash near-dup (the d3 SimHash shape on raw media
    // bytes): a 60-bit DIFFERENCE hash over the first 65 content bytes
    // (bit i set iff byte_{i+2} > byte_{i+1} — the dHash recipe image
    // pipelines run on downscaled pixel intensities; here the
    // deterministic stand-in bytes ARE the content), then pigeonhole
    // 4×15-bit chunk banding makes Hamming≤3 candidate generation an
    // equi-join, with bit_count(xor) verification riding inside the join
    // stage. dHash over aHash deliberately: threshold-against-mean bits
    // are strongly correlated across natural content (measured 181
    // candidates/doc on this corpus), while adjacent-difference bits are
    // near-independent (6/doc) — the difference between a linear and a
    // quadratic candidate stage. Truncated re-encodes (the near-dup
    // population) keep their first 65 bytes, so they collide at Hamming
    // 0 — exactly how dHash catches re-encoded media at scale. Map-only
    // signatures; the only shuffle is the (chunk-band) candidate join.
    "m3_media_phash_neardup" -> ((s, dir) => {
      val pop = DedupPack.withNearDups(s, dir)
      val sg = pop.filter(length(col("text")) >= 65)
        .withColumn("bytes", expr(
          "transform(sequence(1, 65), i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))"))
        .withColumn("sig", expr(
          "aggregate(transform(sequence(0, 59), i -> " +
            "IF(element_at(bytes, i + 2) > element_at(bytes, i + 1), " +
            "shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))), " +
            "CAST(0 AS BIGINT), (a, x) -> a + x)"))
        .select(col("doc_id"), col("sig"))
      // banding + verify-in-stage live in Multimodal.phashNeardupPairs
      // (r9: factored so CI pins candidate density and planted recall at
      // a 10× SIGNATURE table — see MultimodalSpec). The chunk table is
      // cached there: uncached, projection collapse re-derives the
      // interpreted HOF signature from text per JOINED PAIR —
      // Σ|bucket|² evaluations, measured 65 s at sf0.1 vs sub-second
      // with the signature materialized once.
      Multimodal.phashNeardupPairs(sg)
    }),

    // Video frame sampling + keyframe detection — the frame-level half
    // of a video curation pipeline: content bytes split into fixed
    // 16-byte "frames" MAP-SIDE (the deterministic stand-in for a
    // demuxer; a real build swaps the byte slice for a codec call in
    // mapPartitions, same plan shape), every 2nd frame SAMPLED (the
    // fixed-rate frame-sample step — unsampled frames are never hashed,
    // the whole point of sampling before decode at scale), each sampled
    // frame gets a 15-bit adjacent-byte dHash (the m3 recipe at frame
    // grain), and a frame is a KEYFRAME when it's the first sample or
    // its signature sits ≥ 4 Hamming bits from the previous sample —
    // perceptual-hash scene-change detection. Scale shape: the frame
    // explode is map-only (bounded ×n_frames/2 fan-out of narrow rows),
    // the temporal pass is ONE doc-keyed exchange+sort shared by the
    // lag window and the per-doc agg; nothing driver-side.
    // Audio frame energy + silence detection — the audio half of the m4
    // recipe: content bytes split into fixed 8-sample "frames" MAP-SIDE
    // (the deterministic stand-in for PCM decode; a real build swaps the
    // byte read for a codec call in mapPartitions, same plan shape),
    // per-frame energy = Σ(sample − 32)² (spaces ARE silence on the
    // ASCII stand-in), frames under the threshold marked silent, and per
    // doc the silent-frame count, mean energy, and the leading-silence
    // trim index (count of silent frames before the first loud one — the
    // VAD-style head-trim an audio curation pipeline applies before
    // transcription). Scale shape: the per-frame energies come from one
    // HOF expression on the map-only scan; the only shuffle is the
    // doc-keyed partial agg (count/sum/min collapse map-side).
    "m5_audio_energy" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val base = docs.select(col("doc_id"),
        expr("CAST(length(text) DIV 8 AS BIGINT)").as("n_frames"))
      val frames = docs.filter(length(col("text")) >= 8)
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(0, CAST(length(text) DIV 8 AS INT) - 1), " +
          "f -> aggregate(transform(sequence(1, 8), " +
          "i -> CAST(ascii(substring(text, f * 8 + i, 1)) - 32 AS BIGINT)), " +
          "CAST(0 AS BIGINT), (a, x) -> a + x * x))")).as(Seq("fi", "e")))
      val agg = frames.groupBy("doc_id").agg(
        count(lit(1)).as("n_fr"),
        sum(when(col("e") < 5000L, 1L).otherwise(0L)).as("n_silent"),
        sum(col("e")).as("e_total"),
        min(when(col("e") >= 5000L, col("fi").cast("long"))).as("first_loud"))
      base.join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_frames"),
          coalesce(col("n_silent"), lit(0L)).as("n_silent"),
          coalesce(col("first_loud"), col("n_fr"), lit(0L)).as("lead_trim"),
          graft.Num.r6(col("e_total").cast("double")
            / col("n_fr").cast("double")).as("mean_energy"))
    }),

    "m4_video_keyframes" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val base = docs.select(col("doc_id"),
        expr("CAST(length(text) DIV 16 AS BIGINT)").as("n_frames"))
      val frames = docs.filter(length(col("text")) >= 16)
        .select(col("doc_id"), explode(expr(
          // sampled frame indices f = 0, 2, 4, …: 15 adjacent-byte
          // difference bits over bytes [16f+1 .. 16f+16]
          "transform(filter(sequence(0, CAST(length(text) DIV 16 AS INT) - 1), " +
          "f -> f % 2 = 0), f -> struct(f AS fi, " +
          "aggregate(transform(sequence(1, 15), i -> " +
          "IF(ascii(substring(text, f * 16 + i + 1, 1)) > " +
          "ascii(substring(text, f * 16 + i, 1)), " +
          "shiftleft(CAST(1 AS BIGINT), i - 1), CAST(0 AS BIGINT))), " +
          "CAST(0 AS BIGINT), (a, x) -> a + x) AS sig))")).as("g"))
        .select(col("doc_id"), col("g.fi").as("fi"), col("g.sig").as("sig"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("fi")
      val marked = frames
        .withColumn("prev", lag("sig", 1).over(w))
        .withColumn("keyframe", col("prev").isNull ||
          expr("CAST(bit_count(sig ^ prev) AS INT)") >= 4)
      base.join(
          marked.groupBy("doc_id").agg(
            count(lit(1)).as("n_sampled"),
            sum(when(col("keyframe"), 1L).otherwise(0L)).as("n_keyframes")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_frames"),
          coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
          coalesce(col("n_keyframes"), lit(0L)).as("n_keyframes"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "m3_media_phash_neardup" ->
      """WITH ws AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents
        |), pop AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT ws.doc_id + 1000000 AS doc_id,
        |         array_to_string(w[1:greatest(len(w) - 2, 1)], ' ') AS text
        |  FROM ws WHERE ws.doc_id % 20 = 0
        |), by8 AS (
        |  SELECT doc_id,
        |    list_transform(range(1, 66),
        |      i -> CAST(ord(substr(text, CAST(i AS INT), 1)) AS BIGINT)) AS bytes
        |  FROM pop WHERE length(text) >= 65
        |), sg AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(0, 60),
        |      i -> CASE WHEN bytes[CAST(i AS INT) + 2] > bytes[CAST(i AS INT) + 1]
        |                THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
        |                ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sig
        |  FROM by8
        |), chk AS (
        |  SELECT doc_id, sig, c, (sig >> CAST(15 * c AS INT)) & 32767 AS chunk
        |  FROM sg, unnest(range(0, 4)) AS t(c)
        |)
        |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
        |FROM chk a JOIN chk b
        |  ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin,
    "m5_audio_energy" ->
      """WITH base AS (
        |  SELECT doc_id, CAST(strlen(text) // 8 AS BIGINT) AS n_frames,
        |    text
        |  FROM documents
        |), fr AS (
        |  SELECT doc_id, CAST(f AS BIGINT) AS fi,
        |    CAST(list_sum(list_transform(range(1, 9),
        |      i -> CAST(ord(substr(text, CAST(f * 8 + i AS INT), 1)) - 32
        |             AS BIGINT)
        |         * CAST(ord(substr(text, CAST(f * 8 + i AS INT), 1)) - 32
        |             AS BIGINT))) AS BIGINT) AS e
        |  FROM base, unnest(range(0, n_frames)) AS t(f)
        |  WHERE n_frames >= 1
        |), agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fr,
        |    CAST(sum(CASE WHEN e < 5000 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_silent,
        |    CAST(sum(e) AS BIGINT) AS e_total,
        |    min(CASE WHEN e >= 5000 THEN fi END) AS first_loud
        |  FROM fr GROUP BY 1
        |)
        |SELECT base.doc_id, n_frames,
        |  coalesce(n_silent, 0) AS n_silent,
        |  coalesce(first_loud, n_fr, 0) AS lead_trim,
        |  floor((CAST(e_total AS DOUBLE) / CAST(n_fr AS DOUBLE))
        |        * 1000000 + 0.5) / 1000000 AS mean_energy
        |FROM base LEFT JOIN agg USING (doc_id)""".stripMargin,
    "m4_video_keyframes" ->
      """WITH base AS (
        |  SELECT doc_id, CAST(strlen(text) // 16 AS BIGINT) AS n_frames,
        |    text
        |  FROM documents
        |), fr AS (
        |  SELECT doc_id, CAST(f AS BIGINT) AS fi,
        |    CAST(list_sum(list_transform(range(1, 16),
        |      i -> CASE WHEN ord(substr(text, CAST(f * 16 + i + 1 AS INT), 1)) >
        |                     ord(substr(text, CAST(f * 16 + i AS INT), 1))
        |                THEN (CAST(1 AS BIGINT) << CAST(i - 1 AS INT))
        |                ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sig
        |  FROM base, unnest(range(0, n_frames)) AS t(f)
        |  WHERE n_frames >= 1 AND f % 2 = 0
        |), mk AS (
        |  SELECT doc_id, fi, sig,
        |    lag(sig) OVER (PARTITION BY doc_id ORDER BY fi) AS prev
        |  FROM fr
        |), agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sampled,
        |    CAST(sum(CASE WHEN prev IS NULL
        |                       OR bit_count(xor(sig, prev)) >= 4
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_keyframes
        |  FROM mk GROUP BY 1
        |)
        |SELECT base.doc_id, n_frames,
        |  coalesce(n_sampled, 0) AS n_sampled,
        |  coalesce(n_keyframes, 0) AS n_keyframes
        |FROM base LEFT JOIN agg USING (doc_id)""".stripMargin,
    "m2_media_features" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |       ELSE 'video' END AS media_type,
        |  strlen(text) AS n_bytes,
        |  strlen(text) % 64 + 1 AS width,
        |  (strlen(text) // 64) % 64 + 1 AS height,
        |  CASE WHEN doc_id % 3 = 2 THEN strlen(text) % 30 + 1 ELSE 1 END
        |    AS n_frames,
        |  8 AS feature_dim
        |FROM documents""".stripMargin,
    "m1_binary_meta" ->
      """SELECT doc_id,
        |  strlen(text) AS n_bytes,
        |  strlen(text) % 64 + 1 AS width,
        |  CAST(floor(strlen(text) / 64) AS INT) % 64 + 1 AS height
        |FROM documents""".stripMargin
  )
}
