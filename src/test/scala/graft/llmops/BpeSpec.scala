package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Distributed BPE tokenizer training + the codegen'd encode kernel:
  * hand-worked merge sequences, trainer/encoder agreement, code-point
  * symbol semantics, and the no-ranked-pair-survives encode invariant. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def enc(text: String, merges: Seq[(String, String)]): Seq[String] =
    Seq(Tuple1(text)).toDF("t")
      .select(Bpe.encode(col("t"), merges).as("r"))
      .as[Seq[String]].head()

  test("classic example: merges learned in frequency order") {
    // Sennrich-style toy dict: hug×10, pug×5, pun×12, bun×4, hugs×5
    val dict = Array[(String, Long)](
      ("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L), ("hugs", 5L))
    val merges = Bpe.trainLocal(dict, nMerges = 3, minFreq = 1)
    // (u,g)=20, (u,n)=16, then (h,ug)=15 beats (p,u)=17? p+u: pug 5 +
    // pun 12 = 17 — but after merging ug, pug is p|ug (no (p,u) pair);
    // pun keeps (p,u)=12. Round 2: (u,n)=16 wins. Round 3: (h,ug)=15.
    assert(merges.map(m => (m._1, m._2)) ==
      Seq(("u", "g"), ("u", "n"), ("h", "ug")))
    assert(merges.head._3 == 20L)
  }

  test("encode applies merges by rank, lowest first") {
    val merges = Seq(("u", "g"), ("u", "n"), ("h", "ug"), ("hug", "s"))
    assert(enc("hugs", merges) == Seq("hugs"))
    assert(enc("pun", merges) == Seq("p", "un"))
    assert(enc("bug", merges) == Seq("b", "ug"))
    // rank order matters: (h,u) before (u,g) would block ug inside hug
    val rev = Seq(("h", "u"), ("u", "g"))
    assert(enc("hug", rev) == Seq("hu", "g"))
  }

  test("empty merge table = code-point symbols; GPT-2 split boundaries hold") {
    assert(enc("ab 12!", Nil) == Seq("a", "b", " ", "1", "2", "!"))
    // pre-token boundaries are never merged across: "ab 12" splits into
    // pre-tokens [ab][ 12] — a merge of (b, ' ') can never apply
    assert(enc("ab ab", Seq(("b", " "))) == Seq("a", "b", " ", "a", "b"))
    // leading space belongs to the word (GPT-2) and is mergeable inside it
    assert(enc("ab ab", Seq((" ", "a"))) == Seq("a", "b", " a", "b"))
  }

  test("overlapping runs merge left-to-right, no re-merge within a pass") {
    assert(enc("aaaa", Seq(("a", "a"))) == Seq("aa", "aa"))
    assert(enc("aaa", Seq(("a", "a"))) == Seq("aa", "a"))
    assert(enc("aaaa", Seq(("a", "a"), ("aa", "aa"))) == Seq("aaaa"))
  }

  test("supplementary characters are single symbols end to end") {
    val emoji = new String(Character.toChars(0x1F600))
    assert(enc(emoji + emoji, Nil) == Seq(emoji, emoji))
    assert(enc(emoji + emoji, Seq((emoji, emoji))) == Seq(emoji + emoji))
    val m = Bpe.trainLocal(Array((emoji + emoji, 3L)), 1, minFreq = 1)
    assert(m == Seq((emoji, emoji, 3L)))
  }

  test("train ties break on (freq desc, p1, p2); minFreq stops the loop") {
    val m = Bpe.trainLocal(Array(("ab", 5L), ("cd", 5L)), 4, minFreq = 3)
    // (a,b) and (c,d) tie at 5 → (a,b) first; then (c,d); then no pair ≥ 3
    assert(m == Seq(("a", "b", 5L), ("c", "d", 5L)))
  }

  test("distributed train ≡ local train on the same corpus; encode leaves no ranked pair") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(120)
    val distributed = Bpe.train(docs, "text", nMerges = 12, dictCap = 100000)
    val localDict = docs.select(explode(regexp_extract_all(col("text"),
        lit(TextAnalysis.BpeSplitPattern), lit(0))).as("w"))
      .groupBy("w").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(distributed == Bpe.trainLocal(localDict, 12))
    // invariant: encoding with the trained table leaves no adjacent
    // pair that the table would merge
    val pairs = distributed.map(m => (m._1, m._2)).toSet
    val encoded = docs.select(Bpe.encode(col("text"),
      distributed.map(m => (m._1, m._2))).as("toks")).as[Seq[String]].collect()
    assert(encoded.forall(ts =>
      ts.sliding(2).forall(p => p.length < 2 || !pairs((p(0), p(1))))))
    assert(distributed.size == 12, s"fixture trained ${distributed.size} merges")
  }

  test("pairCounts matches a direct recount; encode(Nil) token count = bpeTokenCount") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(80)
    val got = Bpe.pairCounts(docs, "text")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val words = docs.select(explode(regexp_extract_all(col("text"),
        lit(TextAnalysis.BpeSplitPattern), lit(0))).as("w"))
      .as[String].collect()
    val expect = scala.collection.mutable.Map.empty[(String, String), Long]
    words.foreach { w =>
      w.toSeq.map(_.toString).sliding(2).foreach {
        case Seq(a, b) => expect.update((a, b), expect.getOrElse((a, b), 0L) + 1)
        case _ =>
      }
    }
    assert(got == expect.toMap)
    // encode(Nil) = one symbol per code point, and the GPT-2 pattern's
    // alternatives partition the whole text — so the count is exactly
    // the document's code-point count
    val a = docs.select(size(Bpe.encode(col("text"), Nil)).cast("long").as("n"))
      .as[Long].collect().toSeq
    assert(a == docs.select(col("text")).as[String].collect().toSeq
      .map(t => t.codePointCount(0, t.length).toLong))
  }
}
