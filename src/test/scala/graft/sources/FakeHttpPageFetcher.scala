package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** In-memory stand-in for the HTTP side of a real deployment: a "server"
  * holding URL → JSON payload, and a [[PageFetcher]] that "GETs" from it.
  * Exists to prove the fetcher boundary is real — the DSv2 source runs
  * unchanged against a non-file fetcher injected via `option("fetcher")`.
  */
object FakeHttpServer {
  @volatile var pages: Map[String, String] = Map.empty
  @volatile var gets: List[String] = Nil
  def reset(): Unit = synchronized { pages = Map.empty; gets = Nil }
  def record(url: String): Unit = synchronized { gets = url :: gets }
}

/** `path` option = base URL, exactly how a real HTTP fetcher would use
  * it (reference URL shape: scripts/extract_load.py:78).
  */
class FakeHttpPageFetcher(baseUrl: String) extends PageFetcher {
  @transient private lazy val mapper = new ObjectMapper()
  private def get(url: String): JsonNode = {
    FakeHttpServer.record(url)
    mapper.readTree(FakeHttpServer.pages(url))
  }
  override def firstPage(scope: String, code: String): JsonNode =
    get(firstLocator(scope, code))
  override def nextPage(locator: String): JsonNode = get(locator)
  override def firstLocator(scope: String, code: String): String =
    s"$baseUrl/$scope?code=$code&page=1"
}
