package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Graph

/** Degree-oriented triangle counting (`ext.Graph`). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edges(es: (Int, Int)*): DataFrame =
    es.toSeq.toDF("a", "b")

  private def naive(e: DataFrame): Long =
    e.as("e1")
      .join(e.as("e2"), $"e2.a" === $"e1.a" && $"e2.b" > $"e1.b")
      .join(e.as("e3"), $"e3.a" === $"e1.b" && $"e3.b" === $"e2.b")
      .count()

  private def counted(e: DataFrame): Long =
    Graph.triangleCount(e).head().getLong(0)

  test("single triangle, path, and K4") {
    assert(counted(edges((1, 2), (1, 3), (2, 3))) === 1L)
    assert(counted(edges((1, 2), (2, 3))) === 0L)
    val k4 = edges((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
    assert(counted(k4) === 4L)
  }

  test("hub-heavy graph: orientation finds the one closing triangle") {
    // star around 1 (degree 9) + one leaf-leaf edge: exactly 1 triangle.
    // The hub's oriented out-degree must stay small for the wedge join
    // to be skew-free; correctness here pins the count either way.
    val star = (2 to 10).map(i => (1, i)) :+ (4, 7)
    assert(counted(edges(star: _*)) === 1L)
  }

  test("pseudo-random graph matches the naive a<b<c join count") {
    // deterministic pseudo-random simple graph on 40 nodes
    val es = (for {
      a <- 1 to 40; b <- (a + 1) to 40
      if ((a * 31 + b * 17) % 7) == 0
    } yield (a, b))
    val e = edges(es: _*)
    assert(counted(e) === naive(e))
    assert(counted(e) > 0L)
  }

  test("summary reports nodes, edges, triangles") {
    val r = Graph.summary(edges((1, 2), (1, 3), (2, 3), (3, 9))).head()
    assert(r.getLong(0) === 4L) // nodes
    assert(r.getLong(1) === 4L) // edges
    assert(r.getLong(2) === 1L) // triangles
  }

  test("summary releases the edge cache after the census materializes") {
    val e = edges((1, 2), (1, 3), (2, 3))
    val r = Graph.summary(e) // eager: materialized + cache dropped inside
    assert(e.storageLevel === org.apache.spark.storage.StorageLevel.NONE)
    assert(r.head().getLong(2) === 1L)
  }

  test("pair generation caps hot parts and ledgers the drop") {
    // part 100 has 6 suppliers (C(6,2)=15 pairs), part 200 has 3; with
    // the cap at 5 the hot part is dropped WHOLE and ledgered with its
    // true supplier count — only part 200's 3 pairs survive (each with
    // n_shared=1, so mean+2σ keeps them all)
    val ps = ((1 to 6).map(k => (100, k)) ++ (11 to 13).map(k => (200, k)))
      .toDF("p", "k")
    val st = graft.queries.Graph.coSupplierEdgesWithStats(ps, maxSuppliers = 5)
    val led = st.droppedParts.collect()
    assert(led.length === 1)
    assert(led(0).getInt(0) === 100 && led(0).getLong(1) === 6L)
    assert(st.edges.count() === 3L)
    // under the default cap nothing is dropped and all pairs survive
    val st2 = graft.queries.Graph.coSupplierEdgesWithStats(ps)
    assert(st2.droppedParts.isEmpty)
    assert(st2.edges.count() === 15L + 3L)
  }
}
