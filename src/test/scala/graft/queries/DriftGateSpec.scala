package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** q209 — the drift gate wired to the mix. The oracle pins the exact
  * arithmetic; this spec pins the CONTRACT: a planted drifted slice
  * flips the gate and the flipped gate CHANGES the admitted mix, on
  * an otherwise identical corpus. */
class DriftGateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Paired corpus: doc 2k and 2k+1 share text/lang/source, so the
    * even/odd slices are IDENTICAL distributions — every drift
    * statistic is exactly zero and the gate is provably quiet. Texts
    * pass the curation gates (en, ≥30 tokens, punct-light) and each
    * pair is unique so dedup can't collapse sources. */
  private def pairedDocs(n: Int) = {
    (0 until n).map { id =>
      val pair = id / 2
      val words = (0 until 40).map(w => s"tok${pair}x$w").mkString(" ")
      (id.toLong, words, "en", s"src${pair % 4}", words.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def pairedEmb(n: Int) = {
    (0 until n).map { id =>
      val pair = id / 2
      val v = Seq.tabulate(8)(i =>
        (((pair * 48271 + i * 7919) % 997).toFloat / 997f - 0.5f) * 0.6f)
      (id.toLong, v, pair % 5)
    }.toDF("vec_id", "embedding", "label")
  }

  private def card(docs: org.apache.spark.sql.DataFrame,
      emb: org.apache.spark.sql.DataFrame): Map[String, Long] =
    DataPipeQueries.driftGateCard(docs, emb)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("quiet corpus: zero drift, full budget; planted embedding drift halves the admitted mix") {
    val docs = pairedDocs(400)
    val emb = pairedEmb(200)
    val quiet = card(docs, emb)
    // identical slices ⇒ every statistic exactly zero, nothing fires
    assert(quiet("gate_psi_len_num") == 0L)
    assert(quiet("gate_psi_lang_num") == 0L)
    assert(quiet("gate_psi_emb_c0_num") == 0L)
    assert(quiet("gate_ks_len_num") == 0L)
    assert(quiet("gate_any_fired") == 0L)
    assert(quiet("mix_budget") == 2000L)
    // plant drift in the EMBEDDING slice only (odd vec_ids shifted
    // +1.0) — the docs input to the mix is UNCHANGED, so any mix
    // difference is the gate acting
    val drifted = emb.withColumn("embedding",
      when(col("vec_id") % 2 =!= 0,
        expr("transform(embedding, x -> x + CAST(1.0 AS FLOAT))"))
        .otherwise(col("embedding")))
    val hot = card(docs, drifted)
    assert(hot("gate_psi_emb_c0_fired") == 1L,
      s"emb psi ${hot("gate_psi_emb_c0_num")} den ${hot("gate_psi_emb_c0_den")}")
    // token statistics are untouched by the embedding plant
    assert(hot("gate_psi_len_num") == 0L && hot("gate_ks_len_num") == 0L)
    assert(hot("gate_any_fired") == 1L)
    assert(hot("mix_budget") == 1000L)
    // the gate CHANGED the admitted mix: per source, the halved budget
    // admits strictly less train mass (every source holds far more
    // than 2000 chars of train candidates), and each admitted total
    // respects its budget
    val srcs = (0 until 4).map(i => s"src$i")
    srcs.foreach { s =>
      val q = quiet(s"mix_train_chars_$s")
      val h = hot(s"mix_train_chars_$s")
      assert(h < q, s"$s: hot=$h quiet=$q")
      assert(q <= 2000L && h <= 1000L, s"$s: hot=$h quiet=$q")
    }
    // fired-path gate values are exact integers both engines share:
    // den is the smoothed-total product, num ≥ 9455·den exactly when
    // fired says so
    assert(hot("gate_psi_emb_c0_num") >= 9455L * hot("gate_psi_emb_c0_den"))
    assert(quiet("gate_psi_emb_c0_num") < 9455L * quiet("gate_psi_emb_c0_den"))
  }

  test("planted token-length drift flips exactly the len gates; lang and embedding gates stay closed") {
    val docs = pairedDocs(400)
    val emb = pairedEmb(200)
    val quiet = card(docs, emb)
    // plant drift on the TOKEN axis only: odd doc_ids (the `new`
    // slice of psiCard/ksCard) grow 40 → 120 tokens, so the len
    // histogram moves bin 02 → 07 wholesale. lang stays "en",
    // embeddings untouched — only the length statistics may move.
    val padded = docs
      .withColumn("text",
        when(col("doc_id") % 2 =!= 0,
          concat(col("text"), lit(" "),
            array_join(transform(sequence(lit(1), lit(80)),
              i => concat(lit("pad"), col("doc_id"), lit("y"), i)), " ")))
          .otherwise(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val hot = card(padded, emb)
    assert(hot("gate_psi_len_fired") == 1L,
      s"len psi ${hot("gate_psi_len_num")} den ${hot("gate_psi_len_den")}")
    assert(hot("gate_ks_len_fired") == 1L,
      s"ks ${hot("gate_ks_len_num")} den ${hot("gate_ks_len_den")}")
    assert(hot("gate_psi_lang_fired") == 0L)
    assert(hot("gate_psi_emb_c0_fired") == 0L)
    assert(hot("gate_psi_label_fired") == 0L)
    assert(hot("gate_psi_emb_c0_num") == 0L && hot("gate_psi_label_num") == 0L)
    assert(hot("gate_any_fired") == 1L)
    assert(hot("mix_budget") == 1000L)
    // the halved budget admits strictly less train mass per source.
    // A source whose first salted-order train doc is a padded (~120-token)
    // one legitimately gets ZERO admitted docs under the 1000-char budget
    // (Packing.tokenBudgetSample's inclusive-cumulative rule) and is then
    // absent from the card's per-source mix rows — absence means 0 admitted
    // chars, which still satisfies "strictly less".
    (0 until 4).map(i => s"src$i").foreach { s =>
      val hotChars = hot.getOrElse(s"mix_train_chars_$s", 0L)
      assert(hotChars < quiet(s"mix_train_chars_$s"), s)
      assert(hotChars <= 1000L, s)
    }
  }
}
