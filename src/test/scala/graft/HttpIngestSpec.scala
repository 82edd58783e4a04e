package graft

import java.net.InetSocketAddress
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import org.apache.spark.SparkFiles
import org.scalatest.funsuite.AnyFunSuite

/** Remote/object-store ingestion (the reference's httpfs extension,
  * /root/reference/extension/httpfs/httpfs.cpp) through
  * [[graft.sources.HttpFs]]: HEAD-sized listings + ranged-GET seeks,
  * so CSV streams and parquet reads footer-first straight off a web
  * server. The test server is in-process (com.sun.net.httpserver),
  * ephemeral port, honoring Range requests like any real object
  * store; one test also downgrades it to a Range-ignoring server to
  * exercise the skip fallback.
  */
class HttpIngestSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def serve(files: Map[String, Array[Byte]],
                    honorRange: Boolean = true): (HttpServer, Int) = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    files.foreach { case (name, bytes) =>
      server.createContext(s"/$name", new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          ex.getResponseHeaders.add("Content-Type", "application/octet-stream")
          val range = Option(ex.getRequestHeaders.getFirst("Range"))
            .filter(_ => honorRange)
            .flatMap { r => "bytes=(\\d+)-".r.findFirstMatchIn(r).map(_.group(1).toLong) }
          if (ex.getRequestMethod == "HEAD") {
            ex.getResponseHeaders.add("Content-Length", bytes.length.toString)
            ex.sendResponseHeaders(200, -1)
            ex.close()
          } else range match {
            case Some(from) if from < bytes.length =>
              val body = java.util.Arrays.copyOfRange(bytes, from.toInt, bytes.length)
              ex.sendResponseHeaders(206, body.length.toLong)
              val os = ex.getResponseBody; os.write(body); os.close()
            case _ =>
              ex.sendResponseHeaders(200, bytes.length.toLong)
              val os = ex.getResponseBody; os.write(bytes); os.close()
          }
        }
      })
    }
    server.start()
    (server, server.getAddress.getPort)
  }

  private def useHttpFs(): Unit =
    spark.sparkContext.hadoopConfiguration
      .set("fs.http.impl", "graft.sources.HttpFs")

  private def parquetBytes(): Array[Byte] = {
    val dir = Files.createTempDirectory("httppq")
    Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "s")
      .coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val part = Files.list(dir).filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.readAllBytes(part)
  }

  test("CSV over http:// plans a normal distributed scan") {
    val csv = "k|v\n1|alpha\n2|beta\n3|gamma\n".getBytes
    val (server, port) = serve(Map("data.csv" -> csv))
    try {
      useHttpFs()
      val df = spark.read
        .schema("k BIGINT, v STRING")
        .option("header", "true").option("sep", "|")
        .csv(s"http://127.0.0.1:$port/data.csv")
      val rows = df.orderBy("k").as[(Long, String)].collect().toSeq
      assert(rows == Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    } finally server.stop(0)
  }

  test("parquet over http:// reads directly — footer via ranged GET") {
    val (server, port) = serve(Map("t.parquet" -> parquetBytes()))
    try {
      useHttpFs()
      val rows = spark.read.parquet(s"http://127.0.0.1:$port/t.parquet")
        .orderBy("id").as[(Long, String)].collect().toSeq
      assert(rows == Seq((1L, "x"), (2L, "y"), (3L, "z")))
    } finally server.stop(0)
  }

  test("parquet read survives a server that ignores Range (skip fallback)") {
    val (server, port) = serve(Map("t.parquet" -> parquetBytes()), honorRange = false)
    try {
      useHttpFs()
      val rows = spark.read.parquet(s"http://127.0.0.1:$port/t.parquet")
        .orderBy("id").as[(Long, String)].collect().toSeq
      assert(rows.map(_._1) == Seq(1L, 2L, 3L))
    } finally server.stop(0)
  }

  test("addFile fetch-then-read also works (simple one-shot ingestion)") {
    val (server, port) = serve(Map("t2.parquet" -> parquetBytes()))
    try {
      spark.sparkContext.addFile(s"http://127.0.0.1:$port/t2.parquet")
      val local = SparkFiles.get("t2.parquet")
      assert(spark.read.parquet(local).count() == 3)
    } finally server.stop(0)
  }
}
