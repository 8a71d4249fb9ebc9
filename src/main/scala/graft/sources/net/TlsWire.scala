package graft.sources.net

import java.io.FileInputStream
import java.net.ServerSocket
import java.security.{KeyStore, SecureRandom}

import javax.net.ssl.{KeyManagerFactory, SSLContext, SSLServerSocket,
  SSLSocket, TrustManagerFactory}

/** TLS for the h2 transport — the deployment face the reference's
  * production feed actually wears (its Apibara gRPC subscription rides
  * TLS; reference `src/index.ts:16-24`), layered UNDER [[Http2Wire]],
  * which is transport-agnostic and cannot tell h2 from h2c.
  *
  * All of it is the JDK's own public TLS stack:
  *  - ALPN (RFC 7301) negotiates the literal token "h2" — RFC 7540 §3.3's
  *    requirement for HTTP/2 over TLS. Servers OFFER h2 and reject a
  *    connection that negotiated anything else; clients REQUIRE it.
  *  - RFC 7540 §9.2 demands TLS 1.2+; both factories pin the enabled
  *    protocol versions to TLSv1.3/TLSv1.2 explicitly rather than trust
  *    JDK defaults.
  *  - Clients verify the server hostname against the certificate
  *    (endpoint identification "HTTPS", the standard X.509/SAN rule) —
  *    without it a valid-but-wrong certificate would pass.
  *
  * Certificates are a DEPLOYMENT input, as for any JVM service: a PKCS12
  * keystore path + password for the server, a truststore for clients that
  * don't chain to a public CA. TlsWireSpec generates an ephemeral
  * self-signed pair with the JDK's keytool and runs the block-stream
  * drain end-to-end over the result.
  */
object TlsWire {

  /** Load a PKCS12 store (keystore or truststore) from disk. */
  def loadStore(path: String, password: Array[Char]): KeyStore = {
    val ks = KeyStore.getInstance("PKCS12")
    val in = new FileInputStream(path)
    try ks.load(in, password) finally in.close()
    ks
  }

  /** Server SSLContext: the keystore holds the private key + cert chain
    * this server presents. */
  def serverContext(keystorePath: String, password: Array[Char]): SSLContext = {
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(loadStore(keystorePath, password), password)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, new SecureRandom())
    ctx
  }

  /** Client SSLContext: the truststore holds the certificates (or CAs)
    * the client accepts — for a self-signed deployment, the server's own
    * exported certificate. */
  def clientContext(truststorePath: String, password: Array[Char]): SSLContext = {
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(loadStore(truststorePath, password))
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, new SecureRandom())
    ctx
  }

  private val H2 = "h2"
  private val Protocols = Array("TLSv1.3", "TLSv1.2")

  /** Listening socket that offers ALPN "h2" (and TLS 1.2+ only) to every
    * accepted connection. */
  def serverSocket(ctx: SSLContext, port: Int): ServerSocket = {
    val s = ctx.getServerSocketFactory.createServerSocket(port)
      .asInstanceOf[SSLServerSocket]
    val p = s.getSSLParameters
    p.setApplicationProtocols(Array(H2))
    p.setProtocols(Protocols)
    s.setSSLParameters(p)
    s
  }

  /** Force the handshake on an accepted socket and require that ALPN
    * agreed on "h2" — a client that offered no ALPN (or another protocol)
    * is rejected here, before any HTTP/2 byte is read (RFC 7540 §3.3). */
  def requireH2(sock: SSLSocket): SSLSocket = {
    sock.startHandshake()
    val alpn = sock.getApplicationProtocol
    require(alpn == H2, s"ALPN did not negotiate h2 (got '$alpn')")
    sock
  }

  /** Client connect: TLS 1.2+, ALPN "h2", hostname verified against the
    * server certificate's SAN/CN. Fails the handshake on an untrusted or
    * wrong-host certificate, and fails fast if ALPN landed anywhere but
    * h2. */
  def connect(ctx: SSLContext, host: String, port: Int): SSLSocket = {
    val sock = ctx.getSocketFactory.createSocket(host, port)
      .asInstanceOf[SSLSocket]
    val p = sock.getSSLParameters
    p.setApplicationProtocols(Array(H2))
    p.setProtocols(Protocols)
    p.setEndpointIdentificationAlgorithm("HTTPS")
    sock.setSSLParameters(p)
    requireH2(sock)
  }
}
