package graft.streaming

import java.io.{DataInputStream, EOFException, InputStream, OutputStream}
import java.net.Socket
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable.ListBuffer

/** Minimal ZMTP 3.0 wire framing (the public ZeroMQ transport spec,
  * rfc.zeromq.org/spec/23) — just enough for a REAL `zmq.PUSH` producer to
  * connect to [[PushSocketSource]]'s PULL-bind collector and deliver
  * multipart messages, exactly the edge the reference exposes
  * (reference: venus/io/__init__.py:85 `sock.bind` + `recv_multipart`,
  * producers contrib/zmqlog/bind_collector/sender_push_connect.py).
  *
  * Implemented: greeting exchange (version 3.x, any minor), NULL-mechanism
  * READY handshake with a Socket-Type property, short and long frames,
  * multipart MORE chaining, command frames tolerated and skipped. Not
  * implemented (not used by the reference's PUSH/PULL edge): security
  * mechanisms beyond NULL, heartbeats (libzmq only emits PING when
  * explicitly enabled), subscriptions.
  */
object Zmtp {

  /** ZMQ_MAXMSGSIZE analog: a peer claiming a larger frame is disconnected
    * (the option's documented behavior, venus/io/__init__.py:16-18).
    */
  val MaxFrameBytes: Long = 64L * 1024 * 1024

  /** 64-byte greeting: signature %xFF 8%x00 %x7F, version 3.0, mechanism
    * "NULL" zero-padded to 20 bytes, as-server 0, 31 filler bytes.
    */
  private def greeting(): Array[Byte] = {
    val g = new Array[Byte](64)
    g(0) = 0xFF.toByte
    g(9) = 0x7F.toByte
    g(10) = 3 // version-major; peers may answer 3.1 — any minor accepted
    val mech = "NULL".getBytes(StandardCharsets.US_ASCII)
    System.arraycopy(mech, 0, g, 12, mech.length)
    g
  }

  /** READY command frame carrying the Socket-Type property ("PUSH" or
    * "PULL"): flags 0x04, short size, name-prefixed command body,
    * 1-byte-name/4-byte-value property encoding.
    */
  private def ready(socketType: String): Array[Byte] = {
    val name = "READY".getBytes(StandardCharsets.US_ASCII)
    val prop = "Socket-Type".getBytes(StandardCharsets.US_ASCII)
    val v = socketType.getBytes(StandardCharsets.US_ASCII)
    val bodyLen = 1 + name.length + 1 + prop.length + 4 + v.length
    val buf = ByteBuffer.allocate(2 + bodyLen)
    buf.put(0x04.toByte).put(bodyLen.toByte)
    buf.put(name.length.toByte).put(name)
    buf.put(prop.length.toByte).put(prop)
    buf.putInt(v.length).put(v)
    buf.array()
  }

  /** Read one frame: (flags, body). Throws EOFException at stream end. */
  private def readFrame(din: DataInputStream): (Int, Array[Byte]) = {
    val flags = din.read()
    if (flags < 0) throw new EOFException("peer closed")
    val size = if ((flags & 0x02) != 0) din.readLong()
    else {
      val b = din.read()
      if (b < 0) throw new EOFException("peer closed mid-frame")
      b.toLong
    }
    require(size >= 0 && size <= MaxFrameBytes, s"frame too large: $size")
    val body = new Array[Byte](size.toInt)
    din.readFully(body)
    (flags, body)
  }

  private def writeFrame(out: OutputStream, body: Array[Byte], more: Boolean): Unit = {
    val moreBit = if (more) 0x01 else 0x00
    if (body.length < 256) {
      out.write(moreBit)
      out.write(body.length)
    } else {
      out.write(moreBit | 0x02)
      out.write(ByteBuffer.allocate(8).putLong(body.length.toLong).array())
    }
    out.write(body)
  }

  /** PULL-bind server side of the handshake + message pump. The protocol
    * sniffer in [[PushSocketMicroBatchStream]] has already consumed the
    * first signature byte (0xFF); this completes the greeting, validates
    * mechanism NULL, answers READY(PULL), then delivers each complete
    * multipart message to `onMessage` until EOF, a protocol violation
    * (IllegalArgumentException), or `continueServing()` turns false.
    */
  def serveAfterSignatureByte(
      in: InputStream,
      out: OutputStream,
      continueServing: () => Boolean,
      onMessage: Seq[Array[Byte]] => Unit): Unit = {
    val din = new DataInputStream(in)
    out.write(greeting())
    out.flush()
    val sig = new Array[Byte](9) // rest of the peer's 10-byte signature
    din.readFully(sig)
    require(sig(8) == 0x7F.toByte, "bad ZMTP signature tail")
    val major = din.read()
    require(major >= 3, s"unsupported ZMTP version-major $major")
    val rest = new Array[Byte](53) // minor + mechanism(20) + as-server + filler(31)
    din.readFully(rest)
    val mech = new String(rest, 1, 20, StandardCharsets.US_ASCII).takeWhile(_ != 0)
    require(mech == "NULL", s"unsupported mechanism $mech")
    out.write(ready("PULL"))
    out.flush()
    val parts = ListBuffer.empty[Array[Byte]]
    try {
      while (continueServing()) {
        val (flags, body) = readFrame(din)
        if ((flags & 0x04) != 0) {
          // command (peer READY, PING, ...): handshake bookkeeping only
        } else {
          parts += body
          if ((flags & 0x01) == 0) { // final frame of the message
            onMessage(parts.toSeq)
            parts.clear()
          }
        }
      }
    } catch { case _: EOFException => () }
  }

  /** PUSH-connect client speaking real ZMTP — the spec's venus-shaped
    * producer (2-frame [level, payload] messages, PUBHandler wire shape)
    * and a usable forwarder body for bridging actual zmq deployments.
    */
  def sendMultipart(host: String, port: Int, messages: Seq[Seq[Array[Byte]]]): Unit = {
    val sock = new Socket(host, port)
    try {
      val out = sock.getOutputStream
      val din = new DataInputStream(sock.getInputStream)
      out.write(greeting())
      out.flush()
      val g = new Array[Byte](64)
      din.readFully(g)
      require(g(0) == 0xFF.toByte && g(9) == 0x7F.toByte && (g(10) & 0xFF) >= 3,
        "bad server greeting")
      out.write(ready("PUSH"))
      out.flush()
      readFrame(din) // server READY — nothing to inspect for PUSH/PULL
      messages.foreach { ps =>
        ps.zipWithIndex.foreach { case (p, i) =>
          writeFrame(out, p, more = i < ps.length - 1)
        }
      }
      out.flush()
    } finally sock.close()
  }
}
