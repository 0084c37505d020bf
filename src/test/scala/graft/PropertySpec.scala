package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ops.{DedupOps, MarketOps, ScalarOps, VectorOps}

/** Property-based checks (SURVEY §5.3): idempotence of the upsert/dedup
  * merge, order-insensitivity of latest-wins, the F2∘F1 format/extract
  * round-trip, monotonic time decay, and the guarded pct-change. Each
  * property materializes ONE small DataFrame per case, so trials are capped
  * to keep Spark job count sane. */
object PropertySpec extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkTest.session
  import spark.implicits._

  private val rowGen = for {
    id <- Gen.choose(0L, 20L)  // small key space forces collisions
    ts <- Gen.choose(1L, 1000L)
    v <- Gen.choose(0, 10000)
  } yield (id, ts, v / 100.0)

  private val rowsGen = Gen.nonEmptyListOf(rowGen)

  property("latestWins is idempotent: applying the merge twice = once") =
    forAll(rowsGen) { rows =>
      val df = rows.toDF("id", "ts", "v")
      val once = DedupOps.latestWins(df, col("id"), Seq(col("ts").desc, col("v").desc))
      val twice = DedupOps.latestWins(once, col("id"), Seq(col("ts").desc, col("v").desc))
      once.except(twice).isEmpty && twice.except(once).isEmpty
    }

  property("latestWins is input-order insensitive (total per-key ordering)") =
    forAll(rowsGen) { rows =>
      val a = DedupOps.latestWins(
        rows.toDF("id", "ts", "v"), col("id"), Seq(col("ts").desc, col("v").desc))
      val b = DedupOps.latestWins(
        rows.reverse.toDF("id", "ts", "v"), col("id"), Seq(col("ts").desc, col("v").desc))
      a.except(b).isEmpty && b.except(a).isEmpty
    }

  private val barGen = for {
    open <- Gen.choose(1, 99999)
    close <- Gen.choose(1, 99999)
    low <- Gen.choose(1, 99999)
    high <- Gen.choose(1, 99999)
    vol <- Gen.choose(0L, 10000000L)
    vari <- Gen.choose(-9999, 9999)
  } yield (open / 100.0, close / 100.0, low / 100.0, high / 100.0, vari / 100.0, vol)

  property("F2∘F1 round-trip: regex-extract recovers the formatted OHLCV") =
    forAll(Gen.listOfN(20, barGen)) { bars =>
      val df = bars.toDF("open", "close", "low", "high", "vari", "vol")
        .withColumn("summary", ScalarOps.formatSummaryText(
          $"open", $"close", $"low", $"high", $"vari", $"vol"))
        .select(
          $"open", $"close", $"vari", $"vol",
          ScalarOps.extractField($"summary", "Open").as("open_x"),
          ScalarOps.extractField($"summary", "Close").as("close_x"),
          ScalarOps.extractField($"summary", "Variation").as("vari_x"),
          ScalarOps.extractField($"summary", "Volume").cast("long").as("vol_x"))
      df.filter(
        $"open" =!= $"open_x" || $"close" =!= $"close_x" ||
          $"vari" =!= $"vari_x" || $"vol" =!= $"vol_x").isEmpty
    }

  property("time-decay score is non-increasing in age") =
    forAll(Gen.listOfN(30, Gen.choose(0L, 100000L))) { ages =>
      val df = ages.distinct.toDF("age")
        .select($"age", VectorOps.timeDecayScore(lit(0.2), $"age".cast("double")).as("s"))
        .orderBy($"age")
      val ss = df.collect().map(_.getDouble(1))
      ss.sliding(2).forall { case Array(a, b) => a >= b; case _ => true }
    }

  property("pctChange: zero/missing base -> 0.0, else exact ratio") =
    forAll(Gen.choose(0, 10000), Gen.choose(0, 10000)) { (c, p) =>
      val cur = c / 100.0
      val prev = p / 100.0
      val got = Seq((cur, prev)).toDF("c", "p")
        .select(MarketOps.pctChange($"c", $"p")).collect().head.getDouble(0)
      if (prev == 0.0) got == 0.0
      else got == (cur - prev) / prev * 100
    }

  private val tokenGen = Gen.oneOf("join", "hash", "scan", "row", "agg", "a", "x1")
  private val docGen = Gen.nonEmptyListOf(tokenGen).map(_.mkString(" "))

  property("ngramHashes: count = max(0, n-k+1); each hash = polyHash of the gram") =
    forAll(Gen.listOfN(4, docGen), Gen.choose(2, 4)) { (texts, k) =>
      val df = texts.toDF("text")
      val got = df.select(
        graft.expressions.TextHash.ngramHashes($"text", k).as("g"),
        split($"text", " ").as("toks"))
        .collect()
      got.forall { r =>
        val toks = r.getSeq[String](1)
        val hashes = r.getSeq[Long](0)
        val expectLen = math.max(0, toks.length - k + 1)
        hashes.length == expectLen &&
        hashes.indices.forall { i =>
          val gram = toks.slice(i, i + k).mkString(" ")
          // scalar polyHash twin of the expression
          hashes(i) == graft.expressions.TextHash.polyHash(
            org.apache.spark.unsafe.types.UTF8String.fromString(gram))
        }
      }
    }

  property("repetitionStats: native == HOF chain on random corpora") =
    forAll(Gen.listOfN(6, docGen)) { texts =>
      val df = texts.toDF("text")
      val rs = graft.expressions.TextHash.repetitionStats($"text")
      val toks = graft.ops.TextOps.tokens($"text")
      val both = df.select(
        rs.getField("n_tokens"), rs.getField("top_uni"), rs.getField("top_bi"),
        size(toks), graft.ops.TextOps.maxFreq(toks),
        graft.ops.TextOps.maxFreq(graft.ops.TextOps.bigrams(toks)))
        .collect()
      both.forall { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getInt(i))
        r.getInt(0) == r.getInt(3) && opt(1) == opt(4) && opt(2) == opt(5)
      }
    }

  property("cosScalar: symmetric, and |cos| bounded (allowing 1-ulp)") =
    forAll(Gen.listOfN(8, Gen.choose(-1000, 1000)),
      Gen.listOfN(8, Gen.choose(-1000, 1000))) { (ai, bi) =>
      val a = ai.map(_ / 100.0); val b = bi.map(_ / 100.0)
      val ab = graft.queries.MiningQueries.cosScalar(a, b)
      val ba = graft.queries.MiningQueries.cosScalar(b, a)
      ab == ba && math.abs(ab) <= 1.0 + 1e-12
    }

  property("zorder2: exact interleave and invertible over random 16-bit pairs") =
    forAll(Gen.nonEmptyListOf(for {
      x <- Gen.choose(0L, 65535L)
      y <- Gen.choose(0L, 65535L)
    } yield (x, y))) { pairs =>
      val rows = pairs.toDF("x", "y")
        .select(col("x"), col("y"),
          graft.ops.LayoutOps.zorder2(col("x"), col("y")).as("z"))
        .collect()
      rows.forall { r =>
        val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
        val ref = (0 until 16).foldLeft(0L) { (acc, i) =>
          acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
        }
        var dx = 0L; var dy = 0L
        for (i <- 0 until 16) {
          dx |= ((z >> (2 * i)) & 1L) << i
          dy |= ((z >> (2 * i + 1)) & 1L) << i
        }
        z == ref && dx == x && dy == y
      }
    }

  property("negative variation round-trips with sign") = Prop.passed && {
    val df = Seq((10.0, 5.0, 4.0, 11.0, -42.37, 7L))
      .toDF("open", "close", "low", "high", "vari", "vol")
      .withColumn("summary", ScalarOps.formatSummaryText(
        $"open", $"close", $"low", $"high", $"vari", $"vol"))
      .select(ScalarOps.extractField($"summary", "Variation").as("v"))
    df.collect().head.getDouble(0) == -42.37
  }

  // ---- round-6 second-half kernels ---------------------------------------

  private val wordGen = Gen.listOfN(8, Gen.oneOf("key", "agg", "row", "scan",
    "slow", "fast", "a", "the", "kéy", "😀x", "𐐀go"))
    .map(_.mkString(" "))
  /** An edited variant: substitutions, insertions, and deletions applied
    * to a base string — the near-dup shape the fuzzy join hunts. Edits
    * are CODE-POINT edits (the unit both engines' levenshtein counts),
    * and the alphabet includes supplementary-plane code points
    * (surrogate pairs in UTF-16) — the case where a code-UNIT bigram
    * walk would overshoot the 4-per-edit budget and break the bound. */
  private val editAlphabet: IndexedSeq[Int] =
    ('a' to 'z').map(_.toInt) ++ Seq(0xe9, 0x4e2d, 0x1f600, 0x10400, 0x1d11e)
  private val editedPairGen = for {
    base <- wordGen
    nEdits <- Gen.choose(0, 6)
    seed <- Gen.choose(0, Int.MaxValue)
  } yield {
    val rnd = new scala.util.Random(seed)
    var cps = base.codePoints().toArray.toVector
    (1 to nEdits).foreach { _ =>
      if (cps.isEmpty) cps = Vector('x'.toInt)
      val i = rnd.nextInt(cps.length)
      rnd.nextInt(3) match {
        case 0 => cps = cps.updated(i, editAlphabet(rnd.nextInt(editAlphabet.length))) // sub
        case 1 => cps = (cps.take(i) :+ editAlphabet(rnd.nextInt(editAlphabet.length))) ++ cps.drop(i) // ins
        case 2 => cps = cps.take(i) ++ cps.drop(i + 1) // del
      }
    }
    (base, cps.flatMap(Character.toChars(_).toSeq).mkString)
  }

  /** The pruning bound dedup_fuzzy_editdist relies on: bigram multiset L1
    * never exceeds 4× the edit distance, for BOTH adversarial same-vocab
    * pairs and true edit chains. A violation would make the counting
    * filter drop a real near-dup pair. */
  property("bigram_l1 <= 4 * levenshtein (the counting-filter bound)") =
    forAll(editedPairGen) { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
        .select(
          graft.expressions.BigramL1.bigramL1(col("a"), col("b")).as("l1"),
          levenshtein(col("a"), col("b")).as("lev"))
        .collect().head
      df.getInt(0) <= 4 * df.getInt(1)
    }

  /** rolling_median's sorted-midpoint arithmetic vs a brute-force median
    * over random series — including the even/odd interpolation split. */
  property("rolling_median matches brute force over random series") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0, 10000)).map(_.take(25))) { vs =>
      val rows = vs.zipWithIndex.map { case (v, i) =>
        (1L, new java.sql.Timestamp(86400000L + i * 60000L), i.toLong, v / 100.0)
      }
      val dir = java.nio.file.Files.createTempDirectory("pm").toString
      rows.toDF("user_id", "ts", "event_id", "value")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = SparkEntry.queries("rolling_median")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
      rows.indices.forall { i =>
        val win = rows.slice(math.max(0, i - 9), i + 1).map(_._4).sorted
        val n = win.length
        val want =
          if (n % 2 == 1) win((n + 1) / 2 - 1)
          else (win(n / 2 - 1) + win(n / 2)) / 2.0
        got(i.toLong) == want
      }
    }

  // -- native expressions vs their HOF folds on arbitrary float arrays ----
  // The codegen'd kernels claim BIT-identity with the interpreted
  // formulations (same fold order, same widening); random vectors of
  // random equal lengths make that claim a property, not an anecdote.
  private val vecPairGen = for {
    n <- Gen.choose(1, 40)
    a <- Gen.listOfN(n, Gen.choose(-1000, 1000).map(_ / 64.0f))
    b <- Gen.listOfN(n, Gen.choose(-1000, 1000).map(_ / 64.0f))
  } yield (a, b)

  property("SquaredDistance ≡ HOF fold bitwise on random float vectors") =
    forAll(Gen.listOfN(12, vecPairGen)) { pairs =>
      import graft.expressions.SquaredDistance.squaredDist
      val df = pairs.toDF("a", "b").select(
        squaredDist(col("a"), col("b")).as("n"),
        TestFolds.hofSquaredDist(col("a"), col("b")).as("h"))
      df.filter(col("n") =!= col("h")).count() == 0
    }

  property("CosineSimilarity ≡ HOF fold bitwise on random float vectors") =
    forAll(Gen.listOfN(12, vecPairGen)) { pairs =>
      import graft.expressions.CosineSimilarity.cosineSim
      val df = pairs.toDF("a", "b").select(
        cosineSim(col("a"), col("b")).as("n"),
        VectorOps.cosine(col("a"), col("b")).as("h"))
      df.filter(col("n") =!= col("h")).count() == 0
    }
}
