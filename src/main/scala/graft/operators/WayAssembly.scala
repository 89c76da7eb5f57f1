package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J1 — Way⋈Coords ("FillWay", reference cache/delta.go:162-198 +
  * writer/ways.go:79-90): resolve each way's ordered refs to coordinates;
  * a way with ANY missing ref is dropped (all-or-nothing).
  *
  * THE shuffle of the pipeline. Spark shape:
  *   posexplode(refs) ⋈ coords on ref=id → groupBy(way) →
  *   sort_array(collect_list(struct(pos,x,y))) → count==size(refs) gate →
  *   join back to ways for tags (so wide tag maps never ride the explode).
  *
  * At planet scale: coords is billions of rows — both sides shuffle-hash
  * on the ref id; pre-bucketing coords and the exploded refs by id makes
  * this co-located. Locally AQE handles it.
  */
object WayAssembly {

  /** @param ways  (id, refs, ...); all ways, tagged or not
    * @param coords (id, x, y) — already projected to the target SRID
    * @return (id, nodes ARRAY<STRUCT<x,y>>, nrefs) for fully-resolved ways
    */
  def resolve(ways: DataFrame, coords: DataFrame): DataFrame = {
    val exploded = ways
      .select(col("id").as("way_id"), size(col("refs")).as("nrefs"),
        posexplode(col("refs")).as(Seq("pos", "ref")))
    val joined = exploded.join(coords, exploded("ref") === coords("id"))
    joined
      .groupBy(col("way_id"), col("nrefs"))
      .agg(sort_array(collect_list(struct(col("pos"), col("x"), col("y")))).as("pnodes"),
        count(lit(1)).as("nresolved"))
      .filter(col("nresolved") === col("nrefs"))
      .select(col("way_id").as("id"),
        expr("transform(pnodes, p -> struct(p.x as x, p.y as y))").as("nodes"))
  }

  /** Resolved ways joined back to their tags/refs. */
  def withTags(ways: DataFrame, coords: DataFrame): DataFrame = {
    val nodes = resolve(ways, coords)
    ways.join(nodes, Seq("id")).select(ways("id"), col("refs"), col("tags"), col("nodes"))
  }
}
