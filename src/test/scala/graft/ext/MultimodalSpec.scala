package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import sqlImplicits._

  private val docs = Seq(
    (1L, "a" * 100),
    (2L, "hello world"),
    (3L, "x" * 64)).toDF("doc_id", "text")

  test("withPayload: binary column with exact byte length") {
    val r = Multimodal.withPayload(docs)
      .select(col("doc_id"), length(col("payload")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(r == Map(1L -> 100, 2L -> 11, 3L -> 64))
  }

  test("decodeStub: deterministic metadata incl. md5 of the bytes") {
    val m = Multimodal.decodeStub(Multimodal.withPayload(docs))
      .collect().map(x => x.doc_id -> x).toMap
    assert(m(2L).byte_len == 11)
    assert(m(2L).content_md5 == "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
    assert(m(1L).width == 101 && m(1L).height == (700 % 480) + 1)
    // survives partition batching: same results at 1-row batches
    assert(m.size == 3)
  }

  private def expectedSum(id: Long, w: Int, h: Int): Long = {
    var s = 0L
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      s += Multimodal.synthPix(id, x, y, c)
    s
  }

  test("synthImages emits genuine PNG/BMP/JPEG bytes (magic-byte sniff)") {
    val payloads = Multimodal.synthImages(Seq(0L, 1L, 2L).toDF("doc_id"))
      .as[(Long, Array[Byte])].collect().toMap
    assert(Multimodal.sniffFormat(payloads(0L)) == "png")
    assert(Multimodal.sniffFormat(payloads(1L)) == "bmp")
    assert(Multimodal.sniffFormat(payloads(2L)) == "jpg")
    // a real container, not raw pixels: PNG is compressed/chunked
    assert(payloads(0L).length != Multimodal.synthW(0) * Multimodal.synthH(0) * 3)
    // a real JFIF container (APP0 marker + identifier), not raw pixels —
    // a size check is meaningless here: at these tiny dims the fixed
    // JPEG header dwarfs the raster
    val jfif = payloads(2L).slice(6, 10).map(_.toChar).mkString
    assert(jfif == "JFIF", s"expected JFIF APP0, got $jfif")
  }

  test("decodeImages: real codec round trip recovers every pixel (PNG and BMP)") {
    val ids = Seq(0L, 1L, 13L, 57L, 499L) // %3: png, bmp, bmp, png, bmp
    val metas = Multimodal.decodeImages(
      Multimodal.synthImages(ids.toDF("doc_id")))
      .collect().map(m => m.doc_id -> m).toMap
    for (id <- ids) {
      val (w, h) = (Multimodal.synthW(id), Multimodal.synthH(id))
      val m = metas(id)
      assert(m.fmt == Multimodal.synthFmt(id) && m.fmt != "jpg")
      assert(m.width == w && m.height == h && m.channels == 3L)
      assert(m.pix_sum == expectedSum(id, w, h),
        s"doc $id: decoded checksum diverged — codec not lossless?")
    }
  }

  /** The JPEG pixel twin the cross-engine oracle can't carry (lossy
    * decode is bit-exact per decoder, not per spec): the engine's
    * mapPartitions decode must equal a plain same-JVM ImageIO replay
    * EXACTLY, and sit within lossy tolerance of the synthetic source —
    * proving both that the distributed path is a faithful decode and
    * that the decoded content is genuinely the encoded image. */
  test("decodeImages: JPEG rows decode (same-decoder exact, lossy-tolerant vs source)") {
    val ids = Seq(2L, 5L, 56L, 101L) // all %3 == 2 → jpg
    val payloads = Multimodal.synthImages(ids.toDF("doc_id"))
      .as[(Long, Array[Byte])].collect().toMap
    val metas = Multimodal.decodeImages(
      Multimodal.synthImages(ids.toDF("doc_id")))
      .collect().map(m => m.doc_id -> m).toMap
    for (id <- ids) {
      val (w, h) = (Multimodal.synthW(id), Multimodal.synthH(id))
      val m = metas(id)
      assert(m.fmt == "jpg" && m.width == w && m.height == h &&
        m.channels == 3L)
      // same-decoder replay, plain JVM
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payloads(id)))
      var replay = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        replay += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
      }
      assert(m.pix_sum == replay,
        s"doc $id: engine decode diverged from the same-decoder replay")
      val src = expectedSum(id, w, h).toDouble
      assert(math.abs(m.pix_sum - src) / src < 0.05,
        s"doc $id: jpg checksum ${m.pix_sum} not within 5% of source $src")
    }
  }

  test("resizeImages on a JPEG payload matches the same-decoder resample replay") {
    val id = 8L // 8 % 3 == 2 → jpg
    val payloads = Multimodal.synthImages(Seq(id).toDF("doc_id"))
      .as[(Long, Array[Byte])].collect().toMap
    val (w, h) = (Multimodal.synthW(id), Multimodal.synthH(id))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payloads(id)))
    var exp = 0L
    for (y2 <- 0 until 12; x2 <- 0 until 16) {
      val rgb = img.getRGB(x2 * w / 16, y2 * h / 12)
      exp += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
    }
    val row = Multimodal.resizeImages(
      Multimodal.synthImages(Seq(id).toDF("doc_id")), dw = 16, dh = 12)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(row == ((id, w.toLong, h.toLong, 16L, 12L, exp)))
  }

  test("decodeImages: corrupt/unrecognized payload yields an 'unknown' row, not a task kill") {
    val good = Multimodal.synthImages(Seq(0L).toDF("doc_id"))
    val bad = Seq((99L, Array[Byte](1, 2, 3, 4, 5))).toDF("doc_id", "payload")
    // recognized magic, corrupt body: real-world corruption usually
    // PRESERVES the header, so this must degrade per-row too
    val truncated = Seq((98L, Array[Byte]('B', 'M', 1, 2, 3)))
      .toDF("doc_id", "payload")
    val metas = Multimodal.decodeImages(good.union(bad).union(truncated))
      .collect().map(m => m.doc_id -> m).toMap
    assert(metas(99L).fmt == "unknown")
    assert(metas(99L).width == 0L && metas(99L).height == 0L &&
      metas(99L).channels == 0L && metas(99L).pix_sum == 0L)
    assert(metas(98L).fmt == "corrupt")
    assert(metas(98L).width == 0L && metas(98L).pix_sum == 0L)
    // the good row in the same partition still decodes
    assert(metas(0L).fmt == "png" && metas(0L).width == Multimodal.synthW(0))
  }

  test("resizeImages: nearest-neighbor checksum matches the integer-index recompute") {
    val ids = Seq(3L, 7L) // %3: png, bmp — the lossless legs
    val rows = Multimodal.resizeImages(
      Multimodal.synthImages(ids.toDF("doc_id")), dw = 16, dh = 12)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    for (id <- ids) {
      val (w, h) = (Multimodal.synthW(id), Multimodal.synthH(id))
      var exp = 0L
      for (y2 <- 0 until 12; x2 <- 0 until 16; c <- 0 until 3)
        exp += Multimodal.synthPix(id, x2 * w / 16, y2 * h / 12, c)
      assert(rows(id) == ((id, w.toLong, h.toLong, 16L, 12L, exp)))
    }
  }

  test("sampleFrames: strided frames with correct lengths and digests") {
    val f = Multimodal.sampleFrames(docs, frameLen = 64, stride = 4)
    val rows = f.select(col("doc_id"), col("frame_idx"), col("frame_len"))
      .as[(Long, Long, Long)].collect().toSet
    // doc1: 100 chars → frames 0 (64) and 1 (36); stride 4 keeps only 0
    assert(rows == Set((1L, 0L, 64L), (2L, 0L, 11L), (3L, 0L, 64L)))
    val d3md5 = f.filter(col("doc_id") === 3).select("frame_md5").as[String].head()
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(("x" * 64).getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    assert(d3md5 == expected)
  }

  test("stride sampling keeps every 4th frame on long docs") {
    val long = Seq((9L, "z" * 700)).toDF("doc_id", "text")
    val idx = Multimodal.sampleFrames(long, 64, 4)
      .select("frame_idx").as[Long].collect().sorted
    assert(idx.toSeq == Seq(0L, 4L, 8L)) // 11 frames (0..10), strided
  }

  // ===== video (r11) =====

  test("synthVideos emits genuine multi-frame GIF containers") {
    val p = Multimodal.synthVideos(Seq(0L, 5L).toDF("doc_id"))
      .as[(Long, Array[Byte])].collect().toMap
    for ((id, bytes) <- p)
      assert(Multimodal.sniffVideo(bytes) == "gif", s"doc $id not GIF")
  }

  test("sampleVideoFrames: real container parse, strided frames, exact pixels") {
    val ids = Seq(0L, 1L, 5L, 11L) // 2, 3, 7, 7 frames
    val rows = Multimodal.sampleVideoFrames(
        Multimodal.synthVideos(ids.toDF("doc_id")), stride = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map { case (id, nf, f, w, h, s) => (id, f) -> ((nf, w, h, s)) }.toMap
    for (id <- ids) {
      val nf = Multimodal.synthNFrames(id)
      val kept = (0 until nf by 2)
      assert(rows.count(_._1._1 == id) == kept.size)
      for (f <- kept) {
        var sum = 0L
        for (y <- 0 until Multimodal.VideoH; x <- 0 until Multimodal.VideoW)
          sum += Multimodal.synthGray(id, f, x, y)
        assert(rows((id, f.toLong)) ==
          ((nf.toLong, Multimodal.VideoW.toLong, Multimodal.VideoH.toLong, sum)),
          s"doc $id frame $f diverges")
      }
    }
  }

  test("sampleVideoFrames: corrupt payloads degrade per-row") {
    val junk = Seq(
      (50L, "no container".getBytes("UTF-8")),
      (51L, "GIF89agarbage-body".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val good = Multimodal.synthVideos(Seq(3L).toDF("doc_id"))
    val m = Multimodal.sampleVideoFrames(junk.unionByName(good), 2)
      .select("doc_id", "frame_idx").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(m(50L) == Set(-1L)) // unknown magic
    assert(m(51L) == Set(-2L)) // parse failure behind a valid magic
    assert(m(3L) == Set(0L, 2L, 4L)) // 5 frames, stride 2
  }

  test("videoFrameDiffs: exact SADs through the codec; argmax finds the scene") {
    val ids = Seq(1L, 5L, 11L, 16L) // 3, 7, 7, 6 frames (nf >= 3: true scene)
    val rows = Multimodal.videoFrameDiffs(
        Multimodal.synthVideosScenes(ids.toDF("doc_id")))
      .as[(Long, Long, Long, Long)].collect()
    for (id <- ids) {
      val nf = Multimodal.synthNFrames(id)
      val mine = rows.filter(_._1 == id).map(r => r._3 -> r._4).toMap
      assert(mine.keySet == (1 until nf).map(_.toLong).toSet)
      for (f <- 1 until nf) {
        var sad = 0L
        for (y <- 0 until Multimodal.VideoH; x <- 0 until Multimodal.VideoW)
          sad += math.abs(Multimodal.synthGrayScene(id, f, x, y)
            - Multimodal.synthGrayScene(id, f - 1, x, y))
        assert(mine(f.toLong) == sad, s"doc $id diff $f diverges")
      }
      // the constructed +101 boundary at ⌊nf/2⌋ is the unique argmax
      assert(mine.maxBy(_._2)._1 == nf / 2, s"doc $id argmax not the scene")
    }
  }

  test("videoFrameDiffs: corrupt payloads degrade per-row") {
    val junk = Seq(
      (50L, "no container".getBytes("UTF-8")),
      (51L, "GIF89agarbage-body".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val good = Multimodal.synthVideosScenes(Seq(3L).toDF("doc_id"))
    val m = Multimodal.videoFrameDiffs(junk.unionByName(good))
      .select("doc_id", "frame_idx").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(m(50L) == Set(-1L)) // unknown magic
    assert(m(51L) == Set(-2L)) // parse failure behind a valid magic
    assert(m(3L) == Set(1L, 2L, 3L, 4L)) // 5 frames, 4 diffs
  }

  // ===== audio (r11) =====

  test("synthAudio emits genuine RIFF/WAVE containers") {
    val p = Multimodal.synthAudio(Seq(0L, 1L, 5L).toDF("doc_id"))
      .as[(Long, Array[Byte])].collect().toMap
    for ((id, bytes) <- p) {
      assert(Multimodal.sniffAudio(bytes) == "wav", s"doc $id not RIFF/WAVE")
      // a real container: 44-byte canonical header + 2 bytes per sample
      val expectData =
        Multimodal.synthFrames(id) * Multimodal.synthChannels(id) * 2
      assert(bytes.length == 44 + expectData,
        s"doc $id payload ${bytes.length} != 44 + $expectData")
    }
  }

  test("decodeAudio: real WAV round trip recovers format and every sample") {
    // ids cover all rate legs, mono AND stereo, and the frame rotation
    val ids = Seq(0L, 1L, 2L, 3L, 800L, 959L)
    val metas = Multimodal.decodeAudio(
        Multimodal.synthAudio(ids.toDF("doc_id")))
      .collect().map(m => m.doc_id -> m).toMap
    for (id <- ids) {
      val m = metas(id)
      val (ch, nf) = (Multimodal.synthChannels(id), Multimodal.synthFrames(id))
      assert(m.fmt == "wav")
      assert(m.sample_rate == Multimodal.synthRate(id).toLong)
      assert(m.channels == ch.toLong)
      assert(m.n_frames == nf.toLong)
      var (sum, sumsq, mx) = (0L, 0L, 0L)
      for (i <- 0 until nf; c <- 0 until ch) {
        val s = Multimodal.synthSample(id, i, c).toLong
        sum += s; sumsq += s * s; mx = math.max(mx, math.abs(s))
      }
      assert(m.amp_sum == sum, s"doc $id amp_sum ${m.amp_sum} != $sum")
      assert(m.amp_sumsq == sumsq)
      assert(m.amp_max == mx)
    }
  }

  test("decodeAudio: corrupt payloads degrade per-row, never kill the task") {
    val junk = Seq(
      (100L, "not audio at all".getBytes("UTF-8")),
      // valid magic, mangled body: the reader throws past the sniff
      (101L, "RIFF    WAVEgarbage".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val good = Multimodal.synthAudio(Seq(7L).toDF("doc_id"))
    val m = Multimodal.decodeAudio(junk.unionByName(good))
      .collect().map(x => x.doc_id -> x.fmt).toMap
    assert(m == Map(100L -> "unknown", 101L -> "corrupt", 7L -> "wav"))
  }

  test("audioEnergyWindows matches a per-window recompute incl. the short tail") {
    val ids = Seq(2L, 161L) // stereo long clip + mono with a ragged tail
    val rows = Multimodal.audioEnergyWindows(
        Multimodal.synthAudio(ids.toDF("doc_id")), win = 160)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, w, n, sq) => (id, w) -> ((n, sq)) }.toMap
    for (id <- ids) {
      val (ch, nf) = (Multimodal.synthChannels(id), Multimodal.synthFrames(id))
      val nWin = (nf + 159) / 160
      assert(rows.count(_._1._1 == id) == nWin)
      for (w <- 0 until nWin) {
        val (lo, hi) = (w * 160, math.min(nf, w * 160 + 160))
        var sq = 0L
        for (i <- lo until hi; c <- 0 until ch)
          sq += { val s = Multimodal.synthSample(id, i, c).toLong; s * s }
        assert(rows((id, w.toLong)) == ((hi - lo).toLong, sq),
          s"doc $id window $w diverges")
      }
    }
  }

  // ===== perceptual average-hash =====

  /** Independent aHash twin from the CLOSED-FORM pixels (no codec):
    * same pixel→cell map and cross-multiplied threshold the engine and
    * the DuckDB oracle use. */
  private def expectedAhash(id: Long): (Long, Long) = {
    val (w, h) = (Multimodal.synthW(id), Multimodal.synthH(id))
    val cs = new Array[Long](64); val cc = new Array[Long](64)
    var tot = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val gm = 299L * Multimodal.synthPix(id, x, y, 0) +
        587L * Multimodal.synthPix(id, x, y, 1) +
        114L * Multimodal.synthPix(id, x, y, 2)
      val cell = y * 8 / h * 8 + x * 8 / w
      cs(cell) += gm; cc(cell) += 1; tot += gm
    }
    val n = w.toLong * h
    var hi = 0L; var lo = 0L
    for (pos <- 0 until 64; if cs(pos) * n > tot * cc(pos))
      if (pos >= 32) hi |= 1L << (pos - 32) else lo |= 1L << pos
    (hi, lo)
  }

  test("averageHash over the real codec round trip matches the closed form (png/bmp)") {
    val ids = Seq(0L, 1L, 6L, 13L, 57L, 499L, 2048L) // lossless rotation incl. h<8 rows
    val got = Multimodal.averageHash(Multimodal.synthImages(ids.toDF("doc_id")))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    for (id <- ids) {
      assert(got(id) == expectedAhash(id), s"doc $id aHash diverges")
      val (hi, lo) = got(id)
      assert(hi >= 0 && hi < (1L << 32) && lo >= 0 && lo < (1L << 32),
        "halves stay sign-safe 32-bit")
    }
  }

  test("averageHash on a JPEG payload matches a same-decoder local twin") {
    val ids = Seq(2L, 5L, 11L) // %3==2 → jpg
    val got = Multimodal.averageHash(Multimodal.synthImages(ids.toDF("doc_id")))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    val payloads = Multimodal.synthImages(ids.toDF("doc_id"))
      .as[(Long, Array[Byte])].collect().toMap
    for (id <- ids) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payloads(id)))
      val (w, h) = (img.getWidth, img.getHeight)
      val cs = new Array[Long](64); val cc = new Array[Long](64)
      var tot = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val gm = 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
          114L * (rgb & 0xff)
        val cell = y * 8 / h * 8 + x * 8 / w
        cs(cell) += gm; cc(cell) += 1; tot += gm
      }
      val n = w.toLong * h
      var hi = 0L; var lo = 0L
      for (pos <- 0 until 64; if cs(pos) * n > tot * cc(pos))
        if (pos >= 32) hi |= 1L << (pos - 32) else lo |= 1L << pos
      assert(got(id) == ((hi, lo)), s"jpg doc $id aHash != same-decoder twin")
    }
  }

  test("identical synthetic images hash identically (perceptual dedup recall)") {
    // pixels repeat with period lcm(57, 41, 256) = 598272 in doc_id:
    // same dims (mod 57, mod 41) and same pixel values (31 invertible
    // mod 256 => identical iff id mod 256 equal)
    val id = 12L
    val twin = id + 598272L
    val got = Multimodal.averageHash(
      Multimodal.synthImages(Seq(id, twin).toDF("doc_id")))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got(id) == got(twin), "byte-identical images must collide")
  }

  // ---- r12 optimization pins: the per-partition AudioOpener must be
  // semantics-identical to AudioSystem's per-call provider discovery ----

  test("decodeAudio == AudioSystem per-row decode, incl. preferred-reader fallback") {
    // payload 0: PCM float WAV (written by the JDK's float wave writer) —
    // establishes a float-reader preference in the partition's opener;
    // payload 1: plain 16-bit PCM WAV — the preferred reader REJECTS it,
    // so the opener must fall through the provider list exactly like
    // AudioSystem. Both run in ONE partition to exercise the cache.
    def floatWav(): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_FLOAT,
        8000f, 32, 1, 4, 8000f, false)
      val n = 64
      val bb = java.nio.ByteBuffer.allocate(n * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until n).foreach(i => bb.putFloat(i.toFloat / n))
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bb.array()), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    def pcmWav(id: Long): Array[Byte] = {
      val row = Multimodal.synthAudio(Seq(id).toDF("doc_id"))
        .select("payload").as[Array[Byte]].head()
      row
    }
    val payloads = Seq((0L, floatWav()), (1L, pcmWav(7L)), (2L, pcmWav(8L)),
      (3L, "not audio at all".getBytes("UTF-8")),
      (4L, ("RIFF" + "\u0000" * 4 + "WAVEtruncated").getBytes("ISO-8859-1")))
    // ground truth via AudioSystem, row at a time (the pre-r12 mechanics)
    def truth(id: Long, bytes: Array[Byte]): (Long, String, Long, Long, Long) =
      if (Multimodal.sniffAudio(bytes) == "unknown") (id, "unknown", 0L, 0L, 0L)
      else
        try {
          val ais = javax.sound.sampled.AudioSystem
            .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
          val f = ais.getFormat
          val pcm = ais.readAllBytes()
          ais.close()
          var sum = 0L
          var k = 0
          while (k + 1 < pcm.length) {
            sum += ((pcm(2 * (k / 2)) & 0xff) |
              (pcm(2 * (k / 2) + 1).toInt << 8)).toShort.toLong
            k += 2
          }
          (id, "wav", f.getSampleRate.toLong, f.getChannels.toLong, sum)
        } catch { case scala.util.control.NonFatal(_) => (id, "corrupt", 0L, 0L, 0L) }
    val expected = payloads.map { case (id, b) => truth(id, b) }.toSet
    val got = Multimodal.decodeAudio(
        payloads.toDF("doc_id", "payload").coalesce(1))
      .collect()
      .map(m => (m.doc_id, m.fmt, m.sample_rate, m.channels, m.amp_sum)).toSet
    assert(got == expected,
      s"opener diverged from AudioSystem:\ngot      $got\nexpected $expected")
  }
}
