package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** Throwaway micro-probe for the audio codec path (no Spark): times
  * synth+decode of N payloads through (a) AudioSystem per-call discovery
  * and (b) per-batch amortized ServiceLoader providers, serial and with
  * T concurrent threads. `runMain graft.AudioProbe [nDocs] [threads]`. */
object AudioProbe {
  import graft.ext.Multimodal._

  private def synthOne(
      writer: javax.sound.sampled.spi.AudioFileWriter, id: Long): Array[Byte] = {
    val ch = synthChannels(id)
    val nf = synthFrames(id)
    val fmt = new javax.sound.sampled.AudioFormat(
      synthRate(id).toFloat, 16, ch, true, false)
    val pcm = new Array[Byte](nf * ch * 2)
    var i = 0
    while (i < nf) {
      var c = 0
      while (c < ch) {
        val s = synthSample(id, i, c)
        val off = (i * ch + c) * 2
        pcm(off) = (s & 0xff).toByte
        pcm(off + 1) = ((s >> 8) & 0xff).toByte
        c += 1
      }
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, nf.toLong)
    val bos = new ByteArrayOutputStream()
    if (writer == null)
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    else writer.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def decodeOne(
      readers: Array[javax.sound.sampled.spi.AudioFileReader],
      bytes: Array[Byte]): Long = {
    val ais =
      if (readers == null)
        javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(bytes))
      else {
        var i = 0
        var out: javax.sound.sampled.AudioInputStream = null
        while (out == null && i < readers.length) {
          try out = readers(i).getAudioInputStream(new ByteArrayInputStream(bytes))
          catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
          i += 1
        }
        out
      }
    val pcm = ais.readAllBytes()
    ais.close()
    var s = 0L
    var k = 0
    while (k < pcm.length) { s += pcm(k); k += 1 }
    s
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 5000
    val threads = if (args.length > 1) args(1).toInt else 32
    val sink = new java.util.concurrent.atomic.AtomicLong()

    def bench(label: String)(body: Range => Unit): Unit = {
      // warm once
      body(0 until math.min(n, 500))
      val t0 = System.nanoTime()
      body(0 until n)
      val serial = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val step = (n + threads - 1) / threads
      val ts = (0 until threads).map { t =>
        val r = (t * step) until math.min(n, (t + 1) * step)
        val th = new Thread(() => body(r))
        th.start(); th
      }
      ts.foreach(_.join())
      val par = (System.nanoTime() - t1) / 1e9
      println(f"$label%-28s serial=$serial%7.3f s  ${threads}t=$par%7.3f s")
    }

    bench("synth AudioSystem") { r =>
      r.foreach(i => sink.addAndGet(synthOne(null, i.toLong).length.toLong))
    }
    bench("synth amortized") { r =>
      val w = graft.ext.Multimodal.getClass // force init
      val writer = {
        val it = java.util.ServiceLoader
          .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
        var f: javax.sound.sampled.spi.AudioFileWriter = null
        while (f == null && it.hasNext) {
          val c = it.next()
          if (c.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE)) f = c
        }
        f
      }
      r.foreach(i => sink.addAndGet(synthOne(writer, i.toLong).length.toLong))
    }
    val payloads = (0 until n).map(i => synthOne(null, i.toLong)).toArray
    bench("decode AudioSystem") { r =>
      r.foreach(i => sink.addAndGet(decodeOne(null, payloads(i))))
    }
    bench("decode amortized") { r =>
      val readers = {
        val b = Array.newBuilder[javax.sound.sampled.spi.AudioFileReader]
        val it = java.util.ServiceLoader
          .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
        while (it.hasNext) b += it.next()
        b.result()
      }
      r.foreach(i => sink.addAndGet(decodeOne(readers, payloads(i))))
    }
    bench("decode wave-first") { r =>
      val readers = {
        val b = Array.newBuilder[javax.sound.sampled.spi.AudioFileReader]
        val it = java.util.ServiceLoader
          .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
        while (it.hasNext) b += it.next()
        b.result()
      }
      // move the reader that accepts payload 0 to the front — no
      // exception throws on the happy path thereafter
      val ordered = {
        var accept = -1
        var i = 0
        while (accept < 0 && i < readers.length) {
          try {
            readers(i).getAudioInputStream(
              new ByteArrayInputStream(payloads(0))).close(); accept = i
          } catch { case _: Throwable => () }
          i += 1
        }
        if (accept <= 0) readers
        else readers(accept) +: (readers.take(accept) ++ readers.drop(accept + 1))
      }
      r.foreach(i => sink.addAndGet(decodeOne(ordered, payloads(i))))
    }
    println(s"sink=${sink.get()}")
  }
}
