package graft.tools

import graft.dns.DnsWire

/** JVM micro-profile of the per-row ingest kernels (dev aid, not part of
  * the driver contract): isolates DNS parse cost from the Spark-side JSON/
  * timestamp work so optimization effort goes where the time is. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    def u16(v: Int) = Array((v >> 8).toByte, (v & 0xff).toByte)
    val name = Array[Byte](7) ++ "example".getBytes ++ Array[Byte](3) ++ "com".getBytes :+ 0.toByte
    val wire = u16(0x1234) ++ Array(0x81.toByte, 0x80.toByte) ++ u16(1) ++ u16(1) ++ u16(0) ++ u16(0) ++
      name ++ u16(1) ++ u16(1) ++
      Array(0xc0.toByte, 12.toByte) ++ u16(1) ++ u16(1) ++ Array[Byte](0, 0, 1, 44) ++ u16(4) ++
      Array(93.toByte, 184.toByte, 216.toByte, 34.toByte)
    val b64 = java.util.Base64.getEncoder.encodeToString(wire)

    def bench(nameStr: String)(f: => Unit): Unit = {
      var i = 0; while (i < n / 10) { f; i += 1 } // warmup
      val t0 = System.nanoTime()
      i = 0; while (i < n) { f; i += 1 }
      val perOp = (System.nanoTime() - t0).toDouble / n
      println(f"MICRO $nameStr%-14s $perOp%8.1f ns/op  (${1e9 / perOp}%.0f op/s single-thread)")
    }

    bench("dns_parse")(DnsWire.parse(wire))
    bench("base64_decode")(java.util.Base64.getDecoder.decode(b64))
    bench("is_ipv4")(DnsWire.isIpv4("93.184.216.34"))
    val ts = "2024-01-01T00:00:00.123456+03:00"
    bench("iso_parse")(java.time.OffsetDateTime.parse(ts))
  }
}
