package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Pipeline, TextFile}
import graft.queries.Multimodal.StubDecoder

/** End-to-end pipelines in the reference's differential style
  * (VirtualScreeningTest: the PARALLEL containerized pipeline must produce
  * exactly what ONE serial run over the whole input produces), plus real
  * image-header decode checks for the multimodal path. */
class E2EPipelineSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** "Virtual screening" shape: multi-line "molecules" with a $$$$-delimited
    * record format → per-record scoring tool (awk stands in for the docking
    * container) → global top-k. Parallel (8 partitions, tree-reduced top-k)
    * vs serial (1 partition) must agree exactly. */
  test("parallel screening pipeline equals the serial run (top-30)") {
    val rnd = new scala.util.Random(7)
    val mols = (1 to 400).map { i =>
      val atoms = (1 to (3 + rnd.nextInt(5)))
        .map(j => s"ATOM $j ${rnd.nextInt(1000)}").mkString("\n")
      s"MOL_$i\n$atoms"
    }
    val dir = Files.createTempDirectory("graft_e2e_").toString
    Files.write(java.nio.file.Paths.get(s"$dir/input.sdf"),
      mols.mkString("\n$$$$\n").getBytes)
    val delim = "\n$$$$\n"
    // scoring "tool": name + summed atom weights, one line per molecule
    val scoreCmd =
      """awk 'BEGIN{RS="\n\\$\\$\\$\\$\n"} {
        |  split($0, lines, "\n"); s=0;
        |  for (i=2; i<=length(lines); i++) { split(lines[i], f, " "); s+=f[3] }
        |  print lines[1] " " s
        |}' in.sdf > out.txt""".stripMargin.replace("\n", " ")
    // top-30 "sdsorter": numeric sort desc on score, tie-break on name, keep 30
    val topCmd = "sort -k2,2nr -k1,1 in.txt | head -30 > out.txt"

    def run(partitions: Int, depth: Int): Seq[String] =
      Pipeline.textFile(spark, s"$dir/input.sdf", delim)
        .repartition(partitions)
        .mapPartitionsThrough(TextFile("/in.sdf", delim), TextFile("/out.txt"), scoreCmd)
        .treeReduce(TextFile("/in.txt"), TextFile("/out.txt"), topCmd, depth = depth)
        .ds.collect().toSeq

    val serial = run(1, 2)
    val parallel = run(8, 3)
    assert(serial.length == 30)
    assert(parallel == serial)
  }

  /** Genomics-pipeline shape (HaplotypeCallTest): route records to partitions
    * by key (chromosome ≙ doc source), process each partition, results equal
    * the serial per-key computation. */
  test("keyed repartition pipeline equals per-key serial computation") {
    import graft.sources.Tables
    val recs = Tables.documents(spark, sf)
      .selectExpr("concat(source, ' ', length(text)) AS rec").as[String]
    val parallel = Pipeline(recs)
      .repartitionBy(split(col("rec"), " ").getItem(0), 8)
      .mapPartitionsThrough(
        TextFile("/in.txt"), TextFile("/out.txt"),
        // per-partition: sum lengths per key (keys are co-located)
        "awk '{s[$1]+=$2} END {for (k in s) print k, s[k]}' in.txt > out.txt")
      .ds.collect().map(_.split(" ")).map(a => (a(0), a(1).toLong)).toMap
    val expected = Tables.documents(spark, sf)
      .groupBy($"source").agg(sum(length($"text")))
      .as[(String, Long)].collect().toMap
    assert(parallel == expected)
  }

  test("decoder parses real PNG and JPEG headers") {
    // minimal PNG: signature + IHDR with width=640, height=480
    val png = Array[Int](
      0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A, // signature
      0, 0, 0, 13, 'I', 'H', 'D', 'R', // IHDR length + type
      0, 0, 2, 0x80, // width 640
      0, 0, 1, 0xE0, // height 480
      8, 2, 0, 0, 0).map(_.toByte)
    assert(StubDecoder.parsePng(png).contains((640, 480, "png")))
    val m = StubDecoder.decode(1L, png)
    assert((m.width, m.height, m.format) == (640, 480, "png"))

    // minimal JPEG: SOI + APP0 (16 bytes) + SOF0 with height=100, width=200
    val jpeg = (Array[Int](0xFF, 0xD8) ++
      Array[Int](0xFF, 0xE0, 0x00, 0x10) ++ Array.fill(14)(0) ++
      Array[Int](0xFF, 0xC0, 0x00, 0x11, 8, 0x00, 0x64, 0x00, 0xC8, 3) ++
      Array.fill(10)(0)).map(_.toByte)
    assert(StubDecoder.parseJpeg(jpeg).contains((200, 100, "jpeg")))

    // non-image bytes fall back to the deterministic stub
    val junk = "not an image".getBytes
    val s1 = StubDecoder.decode(2L, junk)
    val s2 = StubDecoder.decode(2L, junk)
    assert(s1 == s2)
    assert(s1.n_bytes == junk.length)
  }

  test("frame sampling slices the exact payload bytes, tail included") {
    val bytes = Array.tabulate(10_500)(i => (i % 251).toByte) // 3 frames of 4096 + tail
    val frames = graft.queries.Multimodal.sampleFrames(bytes, 4096, 4).toList
    // stride 4 over ceil(10500/4096)=3 frames keeps only frame 0
    assert(frames.map(_._1) == List(0))
    assert(frames.head._2.toSeq == bytes.slice(0, 4096).toSeq)
    // stride 1 keeps all frames; partial tail is the exact remainder
    val all = graft.queries.Multimodal.sampleFrames(bytes, 4096, 1).toList
    assert(all.map(_._1) == List(0, 1, 2))
    assert(all.map(_._2.length) == List(4096, 4096, 10_500 - 2 * 4096))
    assert(all(2)._2.toSeq == bytes.slice(8192, 10_500).toSeq)
    assert(graft.queries.Multimodal.sampleFrames(Array.empty[Byte], 4096, 4).isEmpty)
  }

  /** The LLM-prep operators composed as ONE dataflow, the way a user would
    * chain them: assign splits → screen the training corpus (drop exact dups
    * and near-dup contaminators of the test set) → apply the mixture sample
    * → pack into token-budget sequences. End-to-end invariants are checked
    * against independent recomputation — each stage is oracle-checked alone,
    * this pins that they compose without key/type/semantic mismatches. */
  test("prep operators compose: split -> screen -> mix -> pack") {
    import graft.queries.{DataPipeline, Dedup}
    import graft.sources.Tables
    import graft.functions.{TextFunctions => TF}
    val splits = DataPipeline.splitAssign(spark, sf).select("doc_id", "split")
    val train = splits.filter($"split" === "train").select("doc_id")
    // screen 1: exact-dup keepers only (minimum doc_id per fingerprint group)
    val keepers = Dedup.dedupExact(spark, sf).select($"keeper_id".as("doc_id"))
    // screen 2: near-dup contaminators of the test split
    val leaked = DataPipeline.contamination(spark, sf)
      .select($"train_doc".as("doc_id")).distinct()
    // mixture sample, restricted to the screened training corpus
    val mixed = DataPipeline.mixWeighted(spark, sf).select("doc_id")
    val corpus = train
      .join(keepers, "doc_id").join(mixed, "doc_id")
      .join(leaked, Seq("doc_id"), "left_anti")
    val corpusIds = corpus.as[Long].collect().toSet
    // independent recompute of the same screen from raw tables
    val all = Tables.documents(spark, sf)
      .select($"doc_id", TF.fingerprintMd5($"text").as("fp")).as[(Long, String)]
      .collect()
    val keeperSet = all.groupBy(_._2).values.map(_.map(_._1).min).toSet
    val trainSet = splits.filter($"split" === "train").select("doc_id").as[Long].collect().toSet
    val mixedSet = mixed.as[Long].collect().toSet
    val leakedSet = leaked.as[Long].collect().toSet
    val expected = trainSet & keeperSet & mixedSet &~ leakedSet
    assert(corpusIds == expected)
    assert(corpusIds.nonEmpty, "screened corpus must be non-empty at this sf")
    // the packed output covers every screened doc's tokens exactly once
    val docs = Tables.documents(spark, sf)
      .join(corpus, "doc_id")
      .select($"doc_id", TF.tokenCount($"text").cast("long").as("n"))
      .as[(Long, Long)].collect()
    val packs = DataPipeline.packSequences(spark, sf)
    // packSequences runs on the FULL corpus by contract; repack the screened
    // one through the same operator shape to pin end-to-end composability
    val screened = Tables.documents(spark, sf).join(corpus, "doc_id")
    val packed = screened
      .select($"source", $"doc_id", TF.tokenCount($"text").cast("long").as("n_tokens"))
      .withColumn("pack_id",
        expr("coalesce(sum(n_tokens) over (partition by source order by doc_id rows between unbounded preceding and 1 preceding), 0) div 256"))
      .groupBy($"source", $"pack_id").agg(sum($"n_tokens").as("t"), count(lit(1)).as("n"))
    val totalPacked = packed.agg(sum($"t")).as[Long].collect().head
    assert(totalPacked == docs.map(_._2).sum, "packing lost or duplicated tokens")
    assert(packs.count() > 0)
  }

  test("resize planning fits within bounds, preserves aspect, never upscales") {
    import graft.queries.Multimodal.StubResizer.fitWithin
    assert(fitWithin(640, 480, 320, 320) == (320, 240))   // width-bound
    assert(fitWithin(480, 640, 320, 320) == (240, 320))   // height-bound
    assert(fitWithin(100, 50, 320, 320) == (100, 50))     // no upscale
    assert(fitWithin(4000, 2, 320, 320) == (320, 1))      // extreme aspect floor 1px
    val (w, h) = fitWithin(1920, 1080, 640, 640)
    assert(w <= 640 && h <= 640)
    assert(math.abs(w.toDouble / h - 1920.0 / 1080) < 0.02)
  }
}
