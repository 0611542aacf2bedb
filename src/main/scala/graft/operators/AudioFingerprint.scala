package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Constellation audio fingerprinting and clip→track matching (Wang,
  * ISMIR 2003) — the audio dedup/attribution modality of a multimodal
  * corpus pipeline: find which source recording a clip was cut from
  * (and where) without ever comparing waveforms directly.
  *
  * Pipeline shape, all relational after the per-row kernel: (1) the
  * codegen'd [[graft.expressions.AudioPeaks]] kernel turns each WAV
  * payload into one dominant spectral bin per frame (real DFT over the
  * decoded PCM — audio bytes never shuffle, only the tiny peak arrays
  * do); (2) peaks pair into (bin1, bin2, dt) hashes via dt=1..maxDt
  * lead windows PARTITIONED BY recording; (3) matching is one
  * inverted-index equi-join on the hash — never a cross product —
  * followed by the classic offset-vote: a true containment lines every
  * joint hash up at ONE (track, trackFrame − clipFrame) offset, so the
  * vote count concentrates there while chance collisions scatter.
  */
object AudioFingerprint {

  private def bridge = org.apache.spark.sql.graft.ColumnBridge

  /** Column form of the peak kernel: `array<int>` of per-frame bins. */
  def audioPeaks(bytes: Column, frameSize: Int): Column =
    bridge.column(graft.expressions.AudioPeaks(
      bridge.expression(bytes), frameSize))

  /** `(id, frame, bin)` rows — one per complete frame per payload;
    * malformed payloads contribute nothing (null-array explode).
    */
  def framePeaks(df: DataFrame, idCol: String, bytesCol: String,
      frameSize: Int): DataFrame =
    df.select(col(idCol).as("id"),
        audioPeaks(col(bytesCol), frameSize).as("__pk"))
      .select(col("id"), posexplode_outer(col("__pk")))
      .toDF("id", "frame", "bin")
      .where(col("bin").isNotNull)

  /** `(id, frame, hash)` constellation hashes: hash encodes
    * `(bin, bin@+dt, dt)` as `(bin*half + bin2)*(maxDt+1) + dt` for
    * dt = 1..maxDt (`half` = frameSize/2, the bin domain).
    */
  def constellation(peaks: DataFrame, frameSize: Int,
      maxDt: Int = 3): DataFrame = {
    require(maxDt >= 1, "maxDt must be >= 1")
    val w = Window.partitionBy(col("id")).orderBy(col("frame"))
    val half = frameSize / 2
    val leads = (1 to maxDt).map(d => lead(col("bin"), d).over(w)
      .as(s"__l$d"))
    val withLeads = peaks.select(
      Seq(col("id"), col("frame"), col("bin")) ++ leads: _*)
    val hashes = (1 to maxDt).map(d =>
      when(col(s"__l$d").isNotNull,
        (col("bin") * half + col(s"__l$d")) * (maxDt + 1) + d))
    withLeads
      .select(col("id"), col("frame"),
        explode(array(hashes: _*)).as("hash"))
      .where(col("hash").isNotNull)
  }

  /** Best source track per clip by offset votes: joins clip hashes to
    * track hashes on the hash, counts votes per
    * `(clip, track, offset = trackFrame − clipFrame)` and keeps the
    * top row per clip by (votes DESC, track ASC, offset ASC).
    * Returns `(clip, track, offset, votes)`.
    */
  def matchClips(trackHashes: DataFrame, clipHashes: DataFrame): DataFrame = {
    val t = trackHashes.select(col("id").as("track"),
      col("frame").as("__tf"), col("hash"))
    val c = clipHashes.select(col("id").as("clip"),
      col("frame").as("__cf"), col("hash"))
    val votes = c.join(t, Seq("hash"))
      .groupBy(col("clip"), col("track"),
        (col("__tf") - col("__cf")).as("offset"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("clip"))
      .orderBy(col("votes").desc, col("track").asc, col("offset").asc)
    votes.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("clip"), col("track"), col("offset"), col("votes"))
  }
}
