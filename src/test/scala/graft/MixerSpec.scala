package graft

import graft.operators.Mixer
import org.apache.spark.sql.functions._

class MixerSpec extends SparkSpec {

  private def tokenCount = size(split(trim(col("text")), "\\s+"))

  test("balancedRates: smallest source keeps everything, others downsample to match") {
    import spark.implicits._
    val docs = Seq(
      ("w w w w", "A"),                          // A: 4 tokens
      ("w w w w w w w w", "B"),                  // B: 8 tokens
      ("w w", "B"))                              // B: +2 -> 10 tokens
      .toDF("text", "source")
    val out = Mixer.balancedRates(docs, tokenCount)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("A") == ((4L, 1.0)), out.toString)
    assert(out("B") == ((10L, 0.4)), out.toString)
  }

  test("targetRates: tightest source pins the total; absent sources drop; shares realized exactly") {
    import spark.implicits._
    val docs = Seq(
      ("w w w w w w w w w w", "web"),   // 10 tokens
      ("w w w w w w", "code"),          // 6 tokens
      ("w w w w", "junk"))              // 4 tokens, not in the target
      .toDF("text", "source")
    // target 50/50 web/code: code runs out first (6/0.5 = 12 < 10/0.5 = 20)
    // -> total 12: code keeps all 6 (rate 1.0), web keeps 6 of 10 (0.6)
    val out = Mixer.targetRates(docs, tokenCount,
      Map("web" -> 0.5, "code" -> 0.5))
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("tokens"), r.getAs[Double]("rate"))).toMap
    assert(out("code") == ((6L, 1.0)), out.toString)
    assert(out("web") == ((10L, 0.6)), out.toString)
    assert(out("junk") == ((4L, 0.0)), out.toString)
    // realized token shares match the target exactly
    val realized = out.map { case (s, (t, r)) => s -> t * r }
    assert(realized("web") == realized("code"))
    // weights are normalized: scaling them changes nothing
    val scaled = Mixer.targetRates(docs, tokenCount,
      Map("web" -> 5.0, "code" -> 5.0))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Double]("rate")).toMap
    assert(scaled("web") == 0.6 && scaled("code") == 1.0)
  }

  test("targetRates: a weighted source with no supply makes the mix loudly infeasible") {
    import spark.implicits._
    val docs = Seq(("w w w w w w w w w w", "web")).toDF("text", "source")
    // "books" is weighted but absent (e.g. a typo'd source name): the
    // mix must collapse to all-zero rates, never silently become 100% web
    val out = Mixer.targetRates(docs, tokenCount,
      Map("web" -> 0.5, "books" -> 0.5))
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("tokens"), r.getAs[Double]("rate"))).toMap
    assert(out.keySet == Set("web", "books"), out.toString)
    assert(out("books") == ((0L, 0.0)), out.toString)
    assert(out("web")._2 == 0.0,
      s"infeasible mix must zero every rate, got ${out("web")}")
  }

  test("temperatureRates: alpha interpolates balanced -> proportional; 0.5 is the exact square root") {
    import spark.implicits._
    val docs = Seq(
      ("w w w w", "A"),                          // A: 4 tokens
      ("w w w w w w w w w w w w w w w w", "B"),  // B: 16 tokens
      ("w", "C"))                                // C: 1 token
      .toDF("text", "source")
    def rates(alpha: Double): Map[String, Double] =
      Mixer.temperatureRates(docs, tokenCount, alpha).collect()
        .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val balanced = Mixer.balancedRates(docs, tokenCount).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rates(0.0) == balanced, "alpha=0 must equal the balanced mix")
    assert(rates(1.0).values.forall(_ == 1.0), "alpha=1 keeps everything")
    val half = rates(0.5)
    // exact square roots of the balanced ratios: 1/4 -> 1/2, 1/16 -> 1/4
    assert(half == Map("A" -> 0.5, "B" -> 0.25, "C" -> 1.0), half.toString)
    // monotone interpolation for every source
    half.foreach { case (s, r) =>
      assert(balanced(s) <= r && r <= 1.0, s"source $s rate $r out of band")
    }
    intercept[IllegalArgumentException](Mixer.temperatureRates(docs, tokenCount, 1.5))
  }

  test("targetRates rejects empty or non-positive weights") {
    import spark.implicits._
    val docs = Seq(("w", "A")).toDF("text", "source")
    intercept[IllegalArgumentException] {
      Mixer.targetRates(docs, tokenCount, Map.empty)
    }
    intercept[IllegalArgumentException] {
      Mixer.targetRates(docs, tokenCount, Map("A" -> -1.0))
    }
  }
}
