"""Offline reverse geocoding with a coordinate-key memo (SURVEY.md S8 + M21).

The reference reverse-geocodes business coordinates against Wikidata with an
in-process memo keyed by the rounded coordinate string
(``location_from_wikidata.py:26-63`` — lookup once per distinct coordinate
key, cache the result). The distributed shape here:

* **M21 coordinate key builder** — :func:`cell_cols`: floor-based 1-degree
  grid cell ids + display keys, fully vectorized. ``floor`` (not ``round``)
  on BOTH engines: DuckDB rounds half-away-from-zero while numpy rounds
  half-to-even, so ``round`` would silently diverge at ``x.5`` boundaries —
  ``floor`` is bit-identical everywhere.
* **S8 reverse geocode** — :func:`reverse_geocode`: the memo pattern as a
  dataflow. Distinct cell ids are computed FIRST (dedup-before-lookup, the
  ST5 memo made distributed), the tiny places table rides the object store
  once and is grid-indexed per actor in ``__init__``, each distinct cell is
  resolved to its nearest place (squared-distance to the CELL CENTER, tied
  by place_id — a pure function of the cell key, which is exactly what
  makes the memo sound), and results join back to conversations by cell id.

At 100 TB only (conv_id, cell_id) rows shuffle; the geocode lookup runs
once per distinct cell regardless of how many rows share it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.grouped import sorted_aggregate
from ..functions.joins import attach_column


def cell_cols(lat, lon) -> tuple[pa.Array, pa.Array]:
    """(cell_id:int64, coord_key:string) for float lat/lon columns.

    cell_id = (floor(lat)+90)*360 + floor(lon)+180 — a collision-free
    integer encoding of the 1-degree grid cell, usable as an equi-join key;
    coord_key = "floor(lat):floor(lon)" — the reference's memo-key string.
    """
    fla = pc.cast(pc.floor(lat), pa.int64())
    flo = pc.cast(pc.floor(lon), pa.int64())
    cell = pc.add(pc.multiply(pc.add(fla, 90), 360), pc.add(flo, 180))
    key = pc.binary_join_element_wise(
        pc.cast(fla, pa.string()), pc.cast(flo, pa.string()), ":")
    return cell, key


def load_places(fixture_dir: str):
    """Driver-side load of the tiny places table (broadcast side)."""
    import pyarrow.parquet as pq
    t = pq.read_table(f"{fixture_dir}/places.parquet")
    return (t["place_id"].to_numpy(), t["lat"].to_numpy(),
            t["lon"].to_numpy())


class CellResolver:
    """Actor-pool callable: grid index built once per actor; resolves each
    DISTINCT cell to its nearest place (to the cell center) or drops it."""

    def __init__(self, places_ref):
        pids, lats, lons = (ray.get(places_ref)
                            if isinstance(places_ref, ray.ObjectRef)
                            else places_ref)
        fla = np.floor(lats).astype(np.int64)
        flo = np.floor(lons).astype(np.int64)
        cells = (fla + 90) * 360 + (flo + 180)
        self.grid: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        for c in np.unique(cells):
            m = cells == c
            self.grid[int(c)] = (pids[m], lats[m], lons[m])

    def __call__(self, b: pa.Table) -> pa.Table:
        out_cell, out_pid = [], []
        for c in b["cell_id"].to_pylist():
            hit = self.grid.get(int(c))
            if hit is None:
                continue
            pids, lats, lons = hit
            # cell center from the id (inverse of cell_cols); same formula
            # as the SQL oracle: (fla+0.5-lat)^2 + (flo+0.5-lon)^2
            fla = c // 360 - 90
            flo = c % 360 - 180
            d = (fla + 0.5 - lats) ** 2 + (flo + 0.5 - lons) ** 2
            best = np.lexsort((pids, d))[0]
            out_cell.append(int(c))
            out_pid.append(int(pids[best]))
        return pa.table({"cell_id": pa.array(out_cell, pa.int64()),
                         "place_id": pa.array(out_pid, pa.int64())})


def load_hierarchy(fixture_dir: str) -> dict[int, tuple]:
    """Driver-side load of the tiny admin-hierarchy table (broadcast side):
    place_id -> (label, level, parent_id, population)."""
    import pyarrow.parquet as pq
    t = pq.read_table(f"{fixture_dir}/admin_hierarchy.parquet")
    return {int(p): (lb, lv, (None if pr is None else int(pr)),
                     (None if pop is None else int(pop)))
            for p, lb, lv, pr, pop in zip(
                t["place_id"].to_pylist(), t["label"].to_pylist(),
                t["level"].to_pylist(), t["parent_id"].to_pylist(),
                t["population"].to_pylist())}


def place_enrichment_triples(resolved: ray.data.Dataset,
                             hierarchy: dict[int, tuple],
                             num_partitions: int = 8) -> ray.data.Dataset:
    """Location + admin-hierarchy enrichment triples (the analog of the
    reference's ``location_from_wikidata.py:401-454``):

    * conversation → schema:location → place IRI — the CORPUS-scale part,
      one stateless vectorized map over the reverse-geocode output;
    * for every REACHED place and its ancestor chain (city → county →
      state → country): rdfs:label (xsd:string), prop:instanceOf (the
      public Wikidata class QIDs the reference uses), prop:population
      (xsd:integer, only where present — the reference's
      ``if row.population`` guard) and prop:containedIn → parent.

    Scale shape: the reached-place set is bounded by the broadcast places
    table (tiny by contract — it rides the object store whole), so the
    DISTINCT place ids aggregate to the driver, the chain closure runs on
    the broadcast dict, and the hierarchy triples are one small local
    table unioned onto the streamed location triples."""
    from .. import config as C
    from ..functions.grouped import sorted_aggregate

    place_iri_prefix = C.WD + "Q9"

    def loc_triples(b: pa.Table) -> pa.Table:
        conv = pc.binary_join_element_wise(
            pa.nulls(b.num_rows, pa.string()).fill_null(
                C.ENT + "conversation/"),
            pc.cast(b["conv_id"], pa.string()), "")
        obj = pc.binary_join_element_wise(
            pa.nulls(b.num_rows, pa.string()).fill_null(place_iri_prefix),
            pc.utf8_lpad(pc.cast(b["place_id"], pa.string()), 6, "0"), "")
        n = b.num_rows
        return pa.table({
            "subj": conv,
            "pred": pa.nulls(n, pa.string()).fill_null(C.PRED_LOCATION),
            "obj": obj,
            "obj_is_literal": pa.nulls(n, pa.bool_()).fill_null(False),
            "obj_datatype": pa.nulls(n, pa.string())})

    locs = resolved.map_batches(loc_triples, batch_format="pyarrow",
                                zero_copy_batch=True)

    distinct = sorted_aggregate(
        resolved.select_columns(["place_id"]), ["place_id"],
        [("place_id", "count")], ["place_id", "n"], num_partitions)
    reached = set()
    for r in distinct.take_all():  # bounded by the broadcast places table
        pid = int(r["place_id"])
        while pid is not None and pid not in reached and pid in hierarchy:
            reached.add(pid)
            pid = hierarchy[pid][2]

    def iri(pid: int) -> str:
        return place_iri_prefix + str(pid).zfill(6)

    rows = []  # (subj, pred, obj, is_lit, dtype)
    for pid in sorted(reached):
        label, level, parent, pop = hierarchy[pid]
        rows.append((iri(pid), C.RDFS_LABEL, label, True, C.XSD_STRING))
        rows.append((iri(pid), C.PRED_INSTANCE_OF,
                     C.PLACE_LEVEL_CLASS[level], False, None))
        if pop is not None:
            rows.append((iri(pid), C.PRED_POPULATION, str(pop), True,
                         C.XSD_INTEGER))
        if parent is not None and parent in reached:
            rows.append((iri(pid), C.PRED_CONTAINED_IN, iri(parent),
                         False, None))
    htab = pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string()),
        "obj_is_literal": pa.array([r[3] for r in rows], pa.bool_()),
        "obj_datatype": pa.array([r[4] for r in rows], pa.string())})
    return locs.union(ray.data.from_arrow(htab))


def reverse_geocode(conv_geo: ray.data.Dataset, places_ref,
                    concurrency: int = 4,
                    num_partitions: int = 8) -> ray.data.Dataset:
    """(conv_id, coord_key, place_id) for every conversation whose grid
    cell contains at least one place."""
    def keyed(b: pa.Table) -> pa.Table:
        cell, key = cell_cols(b["lat"], b["lon"])
        return pa.table({"conv_id": b["conv_id"], "cell_id": cell,
                         "coord_key": key})

    rows = conv_geo.map_batches(keyed, batch_format="pyarrow",
                                zero_copy_batch=True)
    # ST5 memo, distributed: resolve each DISTINCT cell exactly once
    distinct = sorted_aggregate(
        rows.select_columns(["cell_id"]), ["cell_id"],
        [("cell_id", "count")], ["cell_id", "n"], num_partitions)
    from ..functions.broadcast import broadcast_map_batches
    resolved = broadcast_map_batches(
        distinct, lambda: CellResolver(places_ref),
        batch_format="pyarrow")
    i64, s = pa.int64(), pa.string()
    return attach_column(
        rows, resolved,
        left_cols=[("conv_id", s), ("coord_key", s)],
        left_key="cell_id", source_key="cell_id", source_val="place_id",
        out_col="place_id", out_type=i64, num_partitions=num_partitions)
