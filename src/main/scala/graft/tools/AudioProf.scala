package graft.tools

/** Dev micro-profiler for the WAV synth+decode hot path — no Spark.
  * `runMain graft.tools.AudioProf [nRows] [threads]` times the same
  * per-row work Multimodal.synthPcmWav/decodeAudio do, isolating codec
  * cost from Spark plumbing and exposing lock contention (wall time
  * that fails to drop with added threads).
  */
object AudioProf {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 50000
    val threads = if (args.length > 1) args(1).toInt else 32

    def synthOne(id: Long, ns: Int): Array[Byte] = {
      val pcm = new Array[Byte](ns * 2)
      var i = 0
      while (i < ns) {
        val v = (((id * 31 + i * 7) % 4096) - 2048).toInt
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, ns.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    def decodeOne(bytes: Array[Byte]): Long = {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      val data = ais.readAllBytes()
      var s = 0L
      var i = 0
      while (i < data.length / 2) {
        s += (((data(2 * i + 1) << 8) | (data(2 * i) & 0xff))).toShort; i += 1
      }
      s
    }

    def bench(label: String, work: Long => Unit): Unit = {
      // warm
      (0 until 2000).foreach(i => work(i.toLong))
      val t0 = System.nanoTime()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val futs = (0 until n).map(i => pool.submit(new Runnable { def run(): Unit = work(i.toLong) }))
      futs.foreach(_.get())
      pool.shutdown()
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s for $n rows on $threads threads")
    }

    bench("synth(AudioSystem)", id => { synthOne(id, (id % 50 + 20).toInt); () })
    val sample = synthOne(7L, 40)
    bench("decode(AudioSystem)", _ => { decodeOne(sample); () })

    // provider-direct (cached SPI, no AudioSystem registry)
    import scala.jdk.CollectionConverters._
    val readers = java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader]).asScala.toSeq
    def decodeProvider(bytes: Array[Byte]): Long = {
      val ais = readers.iterator.flatMap { r =>
        try Some(r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes)))
        catch { case _: javax.sound.sampled.UnsupportedAudioFileException => None }
      }.next()
      val data = ais.readAllBytes()
      var s = 0L
      var i = 0
      while (i < data.length / 2) {
        s += (((data(2 * i + 1) << 8) | (data(2 * i) & 0xff))).toShort; i += 1
      }
      s
    }
    bench("decode(provider-direct)", _ => { decodeProvider(sample); () })

    // hand-rolled RIFF container (44-byte header + PCM)
    def synthRiff(id: Long, ns: Int): Array[Byte] = {
      val dataLen = ns * 2
      val out = new Array[Byte](44 + dataLen)
      def w32(off: Int, v: Int): Unit = {
        out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
        out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
      }
      def w16(off: Int, v: Int): Unit = {
        out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      }
      "RIFF".getBytes.copyToArray(out, 0); w32(4, 36 + dataLen)
      "WAVE".getBytes.copyToArray(out, 8); "fmt ".getBytes.copyToArray(out, 12)
      w32(16, 16); w16(20, 1); w16(22, 1); w32(24, 8000); w32(28, 16000); w16(32, 2); w16(34, 16)
      "data".getBytes.copyToArray(out, 36); w32(40, dataLen)
      var i = 0
      while (i < ns) {
        val v = (((id * 31 + i * 7) % 4096) - 2048).toInt
        w16(44 + 2 * i, v); i += 1
      }
      out
    }
    bench("synth(hand-rolled RIFF)", id => { synthRiff(id, (id % 50 + 20).toInt); () })
    val sample2 = synthRiff(7L, 40)
    bench("decode(provider, riff input)", _ => { decodeProvider(sample2); () })
  }
}
