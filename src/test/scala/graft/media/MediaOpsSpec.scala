package graft.media

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.BinaryFunctions

class MediaOpsSpec extends SparkSpec {
  import spark.implicits._

  test("byteSum / byteWeightedSum fold bytes unsigned, codegen and interpreted agree") {
    val df = Seq(
      ("a", Array[Byte](1, 2, 3)),
      ("b", Array[Byte](0, -1)), // -1 reads as 0xff = 255
      ("c", Array.empty[Byte]))
      .toDF("k", "bin")
    val got = df.select($"k", BinaryFunctions.byteSum($"bin").as("s"),
      BinaryFunctions.byteWeightedSum($"bin").as("w"))
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("a", 6L, 1L * 1 + 2L * 2 + 3L * 3),
      ("b", 255L, 2L * 255),
      ("c", 0L, 0L)))
  }

  test("byteEnergy / byteCrossings match a reference fold, incl. unsigned reads") {
    val c = 96
    val rows = Seq(
      ("a", Array[Byte](100, 90, 110, 96)), // crossings at 100->90, 90->110; 96 is zero (no strict sign)
      ("b", Array[Byte](-1, 0)),            // 255 and 0 read unsigned: (159)*(−96) < 0 → one crossing
      ("c", Array[Byte](50)),               // single byte: no pairs
      ("d", Array.empty[Byte]))
    val df = rows.toDF("k", "bin")
    val got = df.select($"k",
        BinaryFunctions.byteEnergy($"bin", c).as("e"),
        BinaryFunctions.byteCrossings($"bin", c).as("z"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    def ref(bs: Array[Byte]): (Long, Long) = {
      val u = bs.map(b => (b & 0xff).toLong - c)
      (u.map(v => v * v).sum,
        u.sliding(2).count(p => p.length == 2 && p(0) * p(1) < 0).toLong)
    }
    val want = rows.map { case (k, bs) => val (e, z) = ref(bs); (k, e, z) }
    assert(got == want)
  }

  test("decodeFeatures matches a straight per-row computation, batched path") {
    val media = (1L to 200L).map { i =>
      val payload = s"payload-$i-${"x" * (i % 37).toInt}".getBytes("UTF-8")
      MediaIn(i, if (i % 3 == 0) "image" else "video", payload, 16, 8000, 32)
    }
    val got = MediaOps.decodeFeatures(media.toDS()).collect().sortBy(_.media_id)
    media.zip(got).foreach { case (m, f) =>
      val bytes = m.payload.map(_ & 0xff)
      assert(f.media_id == m.media_id)
      assert(f.byte_count == bytes.length)
      assert(f.byte_sum == bytes.map(_.toLong).sum)
      assert(f.byte_min == bytes.min && f.byte_max == bytes.max)
      assert(f.checksum == bytes.zipWithIndex.map { case (b, i) => (i + 1).toLong * b }.sum)
    }
  }

  test("real PNG payloads decode through imageio to pixel stats; JPEG path engages") {
    // A 7x5 grayscale PNG with a known checkerboard-ish gradient: the
    // decoded features must be PIXEL stats (count = w*h), not container
    // byte stats (a PNG payload is longer than w*h and starts with magic).
    val (w, h) = (7, 5)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val px = Array.tabulate(w * h)(i => ((i * 37 + 11) % 256).toByte)
    img.getRaster.setDataElements(0, 0, w, h, px)
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", buf))
    val png = buf.toByteArray
    assert(png.length != w * h) // container != raster, or the assert below proves nothing

    val got = MediaOps.decodeFeatures(
      Seq(MediaIn(1L, "image", png, w, 8000, 32)).toDS()).collect()(0)
    val u = px.map(_ & 0xff)
    assert(got.byte_count == w * h)
    assert(got.byte_sum == u.map(_.toLong).sum)
    assert(got.byte_min == u.min && got.byte_max == u.max)
    assert(got.checksum == u.zipWithIndex.map { case (b, i) => (i + 1).toLong * b }.sum)

    // JPEG: lossy, so only pin that the codec path engaged (pixel-count
    // features, not container-byte features).
    val jbuf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", jbuf))
    val jgot = MediaOps.decodeFeatures(
      Seq(MediaIn(2L, "image", jbuf.toByteArray, w, 8000, 32)).toDS()).collect()(0)
    assert(jgot.byte_count == w * h)

    // Corrupt container: PNG magic but truncated body falls back to the
    // byte tier instead of throwing mid-stage.
    val broken = png.take(12)
    val bgot = MediaOps.decodeFeatures(
      Seq(MediaIn(3L, "image", broken, w, 8000, 32)).toDS()).collect()(0)
    assert(bgot.byte_count == 12)
  }

  test("resizeImageGray: real bilinear thumbnail for PNG, None for non-images") {
    // Constant-value image: any interpolation of a constant is the
    // constant, so the thumbnail is exactly assertable.
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, 8, 8, Array.fill(64)(200.toByte))
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val thumb = MediaOps.resizeImageGray(buf.toByteArray, 4, 3).get
    assert(thumb.length == 4 * 3)
    assert(thumb.forall(b => (b & 0xff) == 200))
    // Non-image payload: falls to the byte-fold tier (None here).
    assert(MediaOps.resizeImageGray("plain text".getBytes("UTF-8"), 4, 4).isEmpty)
  }

  test("media queries run end-to-end on sf0.001 with expected shapes") {
    val d = "/root/testdata/sf0.001"
    val decode = MediaQueries.qMediaDecode(spark, d)
    val nDocs = spark.read.parquet(s"$d/documents.parquet").count()
    assert(decode.count() == nDocs)
    assert(decode.where($"byte_sum" <= 0 || $"byte_count" <= 0).count() == 0)

    val thumbs = MediaQueries.qImageResize(spark, d)
    assert(thumbs.columns.toSeq == Seq("media_id", "t0", "t1", "t2", "t3", "t4", "t5", "t6", "t7"))
    // every block average is a printable-ASCII mean
    val bad = thumbs.where((1 to 7).map(j => col(s"t$j") < 32 || col(s"t$j") > 126)
      .reduce(_ || _)).count()
    assert(bad == 0)

    val frames = MediaQueries.qFrameSample(spark, d)
    assert(frames.where($"frame_idx" % 2 =!= 0).count() == 0) // every 2nd frame
    assert(frames.where($"frame_len" < 1 || $"frame_len" > 32).count() == 0)

    val stats = MediaQueries.qMediaStats(spark, d).collect()
    assert(stats.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
  }

  test("perceptual Hamming pairs find every planted copy at distance 0") {
    val d = "/root/testdata/sf0.001"
    val got = MediaQueries.qMediaHammingPairs(spark, d)
      .as[(Long, Long, Long)].collect()
    assert(got.forall(_._3 <= 1), "pair beyond the declared Hamming radius")
    val zero = got.filter(_._3 == 0).map(r => (r._1, r._2)).toSet
    val ids = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id").as[Long].collect()
    ids.filter(_ % 10 == 0).foreach { m =>
      assert(zero.contains((m, m + 100000L)),
        s"planted media copy ($m, ${m + 100000L}) not mined")
    }
  }

  test("real WAV payloads decode through javax.sound to PCM sample stats") {
    // A 16-bit mono PCM WAV with a known sawtooth: decoded features must
    // be stats over the raw PCM data bytes (headers stripped), not over
    // the container (which is 44+ bytes longer and starts with 'RIFF').
    val frames = 100
    val pcm = Array.tabulate(frames * 2)(i => ((i * 31 + 7) % 256 - 128).toByte)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    val wav = buf.toByteArray
    assert(wav.length > pcm.length) // container adds headers

    val got = MediaOps.decodeFeatures(
      Seq(MediaIn(1L, "audio", wav, 16, 8000, 32)).toDS()).collect()(0)
    val u = pcm.map(_ & 0xff)
    assert(got.byte_count == pcm.length)
    assert(got.byte_sum == u.map(_.toLong).sum)
    assert(got.byte_min == u.min && got.byte_max == u.max)
    assert(got.checksum == u.zipWithIndex.map { case (b, i) => (i + 1).toLong * b }.sum)
  }

  test("truncated WAV container falls back to byte-level features (no crash)") {
    val junk = "RIFF....WAVEnot-really-a-wav".getBytes("UTF-8")
    val got = MediaOps.decodeFeatures(
      Seq(MediaIn(2L, "audio", junk, 16, 8000, 32)).toDS()).collect()(0)
    val u = junk.map(_ & 0xff)
    assert(got.byte_count == junk.length && got.byte_sum == u.map(_.toLong).sum)
  }

  test("frame slicing reconciles with whole-payload byte sum") {
    val d = "/root/testdata/sf0.001"
    val row = MediaOps.mediaTable(spark, d).where($"kind" === "video")
      .orderBy("media_id").limit(1).select($"payload").collect()(0)
    val payload = row.getAs[Array[Byte]]("payload")
    val total = payload.map(b => (b & 0xff).toLong).sum
    val frameSums = payload.grouped(32).map(_.map(b => (b & 0xff).toLong).sum).sum
    assert(total == frameSums)
  }

  test("byteDistinct / byteMaxFreq histogram kernels, incl. unsigned and empty") {
    val df = Seq(
      ("a", "aabbbb".getBytes("UTF-8")),
      ("b", Array[Byte](0, -1, -1, 7)), // -1 reads as 0xff
      ("c", Array.empty[Byte]),
      ("d", Array.fill[Byte](64)(42)))
      .toDF("k", "bin")
    val got = df.select($"k", BinaryFunctions.byteDistinct($"bin").as("d"),
      BinaryFunctions.byteMaxFreq($"bin").as("m"))
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("a", 2L, 4L), ("b", 3L, 2L), ("c", 0L, 0L), ("d", 1L, 64L)))
  }

  test("m08 byte-entropy screen matches a direct per-payload recomputation") {
    val sf = "/root/testdata/sf0.001"
    val got = MediaQueries.queries("m08_byte_entropy")(spark, sf)
      .as[(Long, String, Long, Long, Long, Boolean)].collect()
    assert(got.nonEmpty)
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    got.foreach { case (id, _, n, dist, mf, low) =>
      val bytes = texts(id).getBytes("UTF-8")
      assert(n == bytes.length.toLong)
      val hist = bytes.groupBy(b => b & 0xff).view.mapValues(_.length.toLong)
      assert(dist == hist.size.toLong, s"asset $id distinct")
      assert(mf == hist.values.max, s"asset $id maxfreq")
      assert(low == (dist <= 16 || mf * 4 >= n), s"asset $id verdict")
    }
  }

  test("m10 format sniff: routing matrix counts reconcile, mismatches flagged") {
    val sf = "/root/testdata/sf0.001"
    val got = MediaQueries.queries("m10_format_sniff")(spark, sf)
      .as[(String, String, Long, Long, Long, Boolean)].collect().toSeq
    assert(got.nonEmpty)
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    // Every asset is routed exactly once.
    assert(got.map(_._3).sum == nDocs)
    // Per-kind shares sum to ~10000 bp (floor-div slack < #formats).
    got.groupBy(_._1).foreach { case (kind, rows) =>
      val tot = rows.map(_._5).sum
      assert(tot > 10000 - rows.length && tot <= 10000, s"$kind shares $tot")
    }
    // The magic cycle (id % 5) and kind cycle (id % 3) interleave, so
    // every format appears under every kind, and e.g. a WAV container
    // inside an 'image' manifest row must be flagged.
    val formats = got.map(_._2).distinct.sorted
    assert(formats == Seq("gif", "ogg", "pdf", "unknown", "wav"),
      s"unexpected formats: $formats")
    val misByCell = got.map(r => (r._1, r._2) -> r._6).toMap
    assert(misByCell(("image", "wav")), "wav-in-image not flagged")
    assert(misByCell(("audio", "gif")), "gif-in-audio not flagged")
    assert(!misByCell(("image", "gif")), "gif-in-image wrongly flagged")
    assert(!misByCell(("audio", "unknown")), "unknown must never be a mismatch")
  }

  test("m11 shot boundaries: invariants hold and a direct recomputation agrees") {
    val sf = "/root/testdata/sf0.001"
    val got = MediaQueries.queries("m11_shot_boundaries")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, nf, shots, longest) =>
      assert(shots >= 1 && shots <= nf, s"asset $id: $shots shots of $nf frames")
      assert(longest >= 1 && longest <= nf, s"asset $id: longest $longest")
      assert(longest >= (nf + shots - 1) / shots,
        s"asset $id: longest shot below the pigeonhole floor")
    }
    assert(got.exists(_._3 > 1), "no asset segmented into multiple shots")
    assert(got.exists(r => r._3 < r._2), "every transition cut — threshold too low")
    // direct recomputation of one asset's segmentation from its bytes
    val (id, nf, shots, longest) = got.head
    val payload = graft.media.MediaOps.mediaTable(spark, sf)
      .where($"media_id" === id).select($"payload")
      .as[Array[Byte]].head()
    val sums = payload.grouped(32).map(_.map(_ & 0xFF).map(_.toLong).sum).toSeq
    assert(sums.length == nf, "frame count")
    val cuts = sums.zip(sums.drop(1)).map { case (p, s) =>
      if (math.abs(s - p) * 10 >= math.max(p, 1L)) 1 else 0
    }
    assert(shots == cuts.sum + 1, s"asset $id: ${cuts.sum + 1} recomputed shots != $shots")
    val lens = cuts.foldLeft(List(1L)) { (acc, c) =>
      if (c == 1) 1L :: acc else (acc.head + 1) :: acc.tail
    }
    assert(longest == lens.max, s"asset $id: recomputed longest ${lens.max} != $longest")
  }
}
