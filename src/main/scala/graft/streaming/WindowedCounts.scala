package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with a watermark — the streaming
  * analogue of the activity-heatmap operator (operators/Sessions.
  * activityHeatmap; reference analyze_dialogues.py:337-403 builds the
  * same counts offline). One state entry per (window, kind); the
  * watermark bounds state and drops late data deterministically.
  */
object WindowedCounts {

  /** rows: (kind, event-time). Works on streaming and batch inputs;
    * on a stream, windows close (emit in Append mode) once the
    * watermark passes their end.
    */
  def perWindow(rows: DataFrame, windowLen: String = "5 minutes",
                watermark: String = "10 minutes"): DataFrame =
    rows
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("kind"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("kind"), col("n"))
}
