"""Deterministic synthetic fixtures (FIXTURES.md §1-3).

Generates, per scale-factor name, the Parquet tables both the Ray pipeline
and the DuckDB oracle read:

* ``transcripts.parquet``  — (conv_id, turn_idx, role, text, tool, ts), the
  exact shape of ``BASELINE.json input_hint``; Zipf-ish conversation lengths
  so hot-key salting is exercised.
* ``entities.parquet``     — external-KG snapshot (entity_id, label, aliases,
  type_id): the offline stand-in for the reference's remote Wikidata lookups
  (``wikidata_functions.py:5-29``, ``location_from_wikidata.py:26-63``).
* ``type_hierarchy.parquet`` — (type_id, super_type_id) DAG, analog of the
  Schema.org subtype lattice (``schema_functions.py:118-132``).
* ``alias_table.parquet``  — (surface_norm, canonical) equivalence / split
  edges, analog of ``manually_split_categories.csv`` + singularizer
  (``category_mappings.py:25-28``, ``string_functions.py:17-41``). Rows whose
  ``surface_norm`` maps to >1 canonical are split edges (compound forms);
  single-target rows are equivalence edges (plural/case variants).
* ``vocab.parquet``        — (surface_form, canonical) fully exploded
  detection vocabulary: every surface form the mention detector searches for,
  with its canonical form(s). This is the *specification* of mention
  detection + canonicalization that the SQL oracle joins against; the Ray
  pipeline must reproduce it from alias_table + normalization alone.
* ``manual_overrides.parquet`` — (surface_norm, entity_id): curated links
  that win over scored ones (analog of the manually-verified mapping CSV,
  reference ``README.md:55``).

Everything is a pure function of (profile name, SEED) — numpy RandomState is
stable across platforms. Files are written once to a versioned cache dir and
reused; bump ``FORMAT_VERSION`` when generation logic changes.

Mention-detection spec (shared with the oracle): a turn mentions surface form
``s`` iff ``lower(s)`` occurs as a substring of ``lower(text)``. Substring
(not word-boundary) semantics keep the Ray and SQL sides trivially identical;
the vocabulary is controlled, so precision is by construction.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.normalize import normalize_one

SEED = 42
# v6: camelCase tool names + camel mention variants (M16 splitter coverage)
# v7: + conv_meta.parquet nested-struct table (M5 flattener coverage)
# v8: + conv_geo.parquet / places.parquet (S8 reverse geocode, M21 keys)
# v9: + admin_hierarchy.parquet (place-hierarchy/population enrichment,
#     reference location_from_wikidata.py:401-454)
FORMAT_VERSION = "v9"
CACHE_ROOT = os.environ.get("YCKG_FIXTURE_DIR", "/tmp/yckg_fixtures")

# conversations per profile; mean conversation length ~= 9 turns.
PROFILES = {
    "sf0.001": 320,
    "sf0.01": 3200,
    "sf0.1": 32000,
    "bench": 500_000,   # ~4.8M turns: scaling-run input (BASELINE.md protocol)
    "bench800": 800_000,  # ~7.7M turns: larger scaling corpus (amortizes
                          # the fixed per-job tail at high CPU counts)
    "bench3200": 3_200_000,  # ~31M turns / ~227M triples: round-4 scaling
                             # corpus — at round-4 throughputs the smaller
                             # corpora finish the HIGH arm in ~20-35 s, so
                             # the ~10 s driver-serial tail (job setup,
                             # task submission, phase barriers) dominates
                             # the ratio; this one keeps the 4N arm >= 60 s
                             # steady-state per the BASELINE.md protocol
    "bench6400": 6_400_000,  # ~61M turns / ~453M triples: round-5 scaling
                             # corpus — the probe-gated dedup made the
                             # engine ~1.6x faster, pushing bench3200's
                             # 16-CPU arm back to ~67 s where the fixed
                             # driver-serial tail re-dominates the ratio
                             # (the same reasoning that introduced
                             # bench3200); this one restores a >= 2 min
                             # high arm
}

# --- controlled vocabulary ---------------------------------------------------
# ~100 canonical terms; lowercase; lexicographic minimum of their variant
# cluster (plural = +"s", case variants normalize to the same string), so the
# canonicalizer's lex-min tie-break provably recovers them (SURVEY.md §7).
BASE_TERMS = [
    "almond", "antique", "aquarium", "archery", "bagel", "bakery", "ballet",
    "banjo", "barbecue", "basil", "bistro", "bonsai", "botany", "bowling",
    "brunch", "burrito", "cactus", "calligraphy", "canoe", "caramel",
    "cardio", "ceramic", "cheddar", "chess", "cinema", "cocoa", "coffee",
    "comedy", "compost", "croissant", "cycling", "dumpling", "espresso",
    "falafel", "fencing", "fitness", "florist", "fondue", "fresco", "gallery",
    "garden", "gelato", "ginger", "granola", "guitar", "health", "hiking",
    "honey", "hummus", "jazz", "juggling", "kayak", "kimchi", "lasagna",
    "lavender", "lentil", "library", "mango", "marathon", "museum", "noodle",
    "nougat", "oboe", "orchard", "origami", "painting", "pasta", "pastry",
    "photography", "piano", "pilates", "pizza", "poetry", "pottery",
    "pretzel", "quiche", "ramen", "risotto", "robotics", "saffron", "salsa",
    "sauna", "sculpture", "skating", "snorkel", "sorbet", "spice", "squash",
    "sushi", "taco", "tango", "tapas", "tea", "tennis", "theater", "truffle",
    "violin", "waffle", "yoga", "zumba",
]
# adversarial near-miss pairs: 1 edit apart, must NOT merge (FIXTURES.md §2)
NEAR_MISS = [("quartz", "quarts"), ("latte", "latke"), ("mocha", "macha"),
             ("curry", "carry"), ("berry", "ferry")]
TWO_WORD = [
    "machine learning", "data engineering", "rock climbing", "wine tasting",
    "street food", "live music", "board game", "art deco", "craft beer",
    "food truck", "night market", "open mic", "swing dance", "trail running",
    "urban farming",
]
# compound split fixtures: "A & B" -> [a, b] (analog of manual split CSV)
COMPOUND_PAIRS = [
    ("coffee", "tea"), ("health", "fitness"), ("pizza", "pasta"),
    ("museum", "gallery"), ("jazz", "tango"), ("sushi", "ramen"),
    ("yoga", "pilates"), ("hiking", "cycling"), ("honey", "ginger"),
    ("cinema", "theater"), ("garden", "orchard"), ("guitar", "violin"),
    ("waffle", "pretzel"), ("kayak", "canoe"), ("salsa", "zumba"),
    ("poetry", "comedy"), ("gelato", "sorbet"), ("taco", "burrito"),
    ("chess", "bowling"), ("fresco", "fondue"),
]
TOOLS = ["search", "browser", "python", "calculator", "sql", "bash",
         "email", "calendar", "maps", "translate", "weather", "files",
         # camelCase tool names: the M16 splitter must normalize these to
         # web_search / code_interpreter / data_viz in tool IRIs
         "WebSearch", "CodeInterpreter", "DataViz"]
NONE_TOOL_VALUES = ["", "None", "none", "null", "Null", "NULL"]

TEMPLATES_0 = [
    "Booking confirmed, see you then.",
    "Thanks, that answers my question.",
    "Running the requested step now.",
    "Here is the summary you asked for.",
    "No further action needed on this thread.",
    "Acknowledged; proceeding with the plan.",
]
TEMPLATES_1 = [
    "Could you tell me more about {m0}?",
    "I really enjoyed the {m0} yesterday.",
    "The report on {m0} is ready for review.",
    "Searching for {m0} options near downtown.",
    "My favorite topic lately is {m0}, honestly.",
    "Please add {m0} to the shortlist.",
]
TEMPLATES_2 = [
    "Let's compare {m0} and {m1} before deciding.",
    "Found results for {m0} as well as {m1}.",
    "Between {m0} and {m1}, which do you prefer?",
    "The guide covers {m0} plus a section on {m1}.",
]
TEMPLATES_3 = [
    "Top picks: {m0}, {m1}, and {m2} in that order.",
    "We shortlisted {m0}, then {m1}, finally {m2}.",
]


def canonical_terms() -> list[str]:
    terms = list(BASE_TERMS) + [a for p in NEAR_MISS for a in p] + [
        normalize_one(t) for t in TWO_WORD]
    return sorted(set(terms))


def _variants(term: str) -> list[str]:
    """Surface-form variants of a canonical term that appear in text."""
    disp = term.replace("_", " ")
    out = [disp, disp.capitalize(), disp.upper(), disp + "s"]
    if "_" in term:  # camel variant of multi-word terms: MachineLearning
        out.append("".join(w.capitalize() for w in disp.split(" ")))
    return out


def build_vocab_tables():
    """Return (alias_rows, vocab_rows, mention_pool).

    alias_rows: (surface_norm, canonical) — variant + split edges.
    vocab_rows: (surface_form, canonical) — exploded detection vocabulary.
    mention_pool: surface forms sampled into generated text.
    """
    terms = canonical_terms()
    alias_rows: list[tuple[str, str]] = []
    vocab_rows: list[tuple[str, str]] = []
    pool: list[str] = []
    for t in terms:
        for v in _variants(t):
            # alias edges are keyed by the DETECTOR-visible norm: detection
            # scans lower(text), so a camel variant like "MachineLearning"
            # is seen as "machinelearning" — that lowered-then-normalized
            # form (not normalize(v), where the camel splitter would already
            # recover the canonical) is what canonicalization must map
            n = normalize_one(v.lower())
            if n != t:
                alias_rows.append((n, t))  # equivalence edge (plural/camel)
            vocab_rows.append((v.lower(), t))  # detection is case-insensitive
            pool.append(v)
    for a, b in COMPOUND_PAIRS:
        for sf in (f"{a.capitalize()} & {b.capitalize()}", f"{a}/{b}"):
            n = normalize_one(sf)
            alias_rows.append((n, a))   # split edges: one norm -> 2 canonicals
            alias_rows.append((n, b))
            vocab_rows.append((sf.lower(), a))
            vocab_rows.append((sf.lower(), b))
            pool.append(sf)
    alias_rows = sorted(set(alias_rows))
    vocab_rows = sorted(set(vocab_rows))
    return alias_rows, vocab_rows, sorted(set(pool))


def build_kg_snapshot():
    """entities / type_hierarchy / manual_overrides (FIXTURES.md §3)."""
    rng = np.random.RandomState(SEED + 7)
    terms = canonical_terms()
    n_types = 80
    type_ids = [f"T{i:03d}" for i in range(n_types)]
    # DAG: each non-root type gets 1-2 parents with smaller index
    th_rows = []
    for i in range(1, n_types):
        parents = rng.choice(i, size=min(i, rng.randint(1, 3)), replace=False)
        for p in sorted(set(parents.tolist())):
            th_rows.append((type_ids[i], type_ids[p]))
    ent_rows = []
    qid = 1000
    for t in terms:  # linkable entities: label == display form of canonical
        disp = t.replace("_", " ")
        aliases = [disp + "s", disp.title()]
        ent_rows.append((f"Q{qid}", disp, aliases, type_ids[qid % n_types]))
        qid += 1
    for i in range(150):  # distractors never mentioned in text
        label = f"distractor entity {i:03d}"
        ent_rows.append((f"Q{qid}", label, [f"de{i:03d}"], type_ids[qid % n_types]))
        qid += 1
    # manual overrides: 20 surface norms pinned to specific entities
    overrides = []
    label_to_qid = {normalize_one(r[1]): r[0] for r in ent_rows}
    for t in sorted(terms)[:20]:
        overrides.append((t, label_to_qid[t]))
    return ent_rows, th_rows, overrides


def _compose_texts(rng: np.random.RandomState, n: int, pool: list[str]) -> list[str]:
    n_mentions = rng.choice([0, 1, 2, 3], size=n, p=[0.35, 0.40, 0.20, 0.05])
    t0 = rng.randint(0, len(TEMPLATES_0), size=n)
    t1 = rng.randint(0, len(TEMPLATES_1), size=n)
    t2 = rng.randint(0, len(TEMPLATES_2), size=n)
    t3 = rng.randint(0, len(TEMPLATES_3), size=n)
    m = rng.randint(0, len(pool), size=(n, 3))
    out = []
    for i in range(n):
        k = n_mentions[i]
        if k == 0:
            out.append(TEMPLATES_0[t0[i]])
        elif k == 1:
            out.append(TEMPLATES_1[t1[i]].format(m0=pool[m[i, 0]]))
        elif k == 2:
            out.append(TEMPLATES_2[t2[i]].format(m0=pool[m[i, 0]], m1=pool[m[i, 1]]))
        else:
            out.append(TEMPLATES_3[t3[i]].format(
                m0=pool[m[i, 0]], m1=pool[m[i, 1]], m2=pool[m[i, 2]]))
    return out


def generate_transcripts(n_convs: int, seed: int = SEED) -> pa.Table:
    rng = np.random.RandomState(seed)
    lengths = rng.randint(4, 15, size=n_convs)
    hot = np.arange(0, n_convs, 500)  # every 500th conversation is hot
    lengths[hot] = rng.randint(150, 400, size=len(hot))
    total = int(lengths.sum())

    conv_idx = np.repeat(np.arange(n_convs), lengths)
    turn_idx = np.concatenate([np.arange(l) for l in lengths]).astype(np.int32)
    conv_id = np.char.add("conv", np.char.zfill(conv_idx.astype(str), 8))

    r = rng.random_sample(total)
    role = np.where(turn_idx % 2 == 0, "user", "assistant")
    role = np.where((turn_idx > 0) & (r < 0.12), "tool", role)
    role = np.where(turn_idx == 0, np.where(r < 0.3, "system", "user"), role)

    # tool column: real tool on tool/assistant turns ~60% of the time, else a
    # none-ish value (exercises the none-filter + dead-letter path)
    tool_pick = np.array(TOOLS)[rng.randint(0, len(TOOLS), size=total)]
    none_pick = np.array(NONE_TOOL_VALUES)[rng.randint(0, len(NONE_TOOL_VALUES), size=total)]
    has_tool = np.isin(role, ("tool", "assistant")) & (rng.random_sample(total) < 0.6)
    tool = np.where(has_tool, tool_pick, none_pick)

    _, _, pool = build_vocab_tables()
    texts = _compose_texts(rng, total, pool)

    base = np.int64(datetime(2025, 1, 1, tzinfo=timezone.utc).timestamp() * 1_000_000)
    conv_start = base + conv_idx.astype(np.int64) * 7_919_000_000  # ~2.2h apart
    ts = conv_start + turn_idx.astype(np.int64) * 37_000_000 \
        + rng.randint(0, 5_000_000, size=total)

    return pa.table({
        "conv_id": pa.array(conv_id, pa.string()),
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": pa.array(role, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tool, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })


def generate_conv_meta(n_convs: int, seed: int = SEED) -> pa.Table:
    """Per-conversation nested-struct metadata (M5 flattener fixture): the
    analog of the reference's nested business-attribute dicts
    (``dictionary_functions.py:1-18``), including an ``hours``-style subtree
    that flattening must EXCLUDE (reference excludes the hours dict)."""
    rng = np.random.RandomState(seed + 13)
    conv_id = np.char.add("conv", np.char.zfill(
        np.arange(n_convs).astype(str), 8))
    clients = np.array(["web", "ios", "android", "cli"])[
        rng.randint(0, 4, size=n_convs)]
    oss = np.array(["linux", "macos", "windows"])[
        rng.randint(0, 3, size=n_convs)]
    vers = np.char.add("v", rng.randint(1, 9, size=n_convs).astype(str))
    latency = rng.randint(20, 2000, size=n_convs).astype(np.int64)
    beta = rng.random_sample(n_convs) < 0.25
    verbose = rng.random_sample(n_convs) < 0.5
    opens = np.char.add(np.char.zfill(
        rng.randint(6, 11, size=n_convs).astype(str), 2), ":00")
    closes = np.char.add(rng.randint(17, 24, size=n_convs).astype(str), ":00")
    meta = pa.StructArray.from_arrays(
        [pa.array(clients.tolist(), pa.string()),
         pa.StructArray.from_arrays(
             [pa.array(oss.tolist(), pa.string()),
              pa.array(vers.tolist(), pa.string())], ["os", "version"]),
         pa.array(latency, pa.int64()),
         pa.StructArray.from_arrays(
             [pa.array(beta), pa.array(verbose)], ["beta", "verbose"]),
         pa.StructArray.from_arrays(
             [pa.array(opens.tolist(), pa.string()),
              pa.array(closes.tolist(), pa.string())], ["open", "close"])],
        ["client", "device", "latency_ms", "flags", "hours"])
    return pa.table({"conv_id": pa.array(conv_id.tolist(), pa.string()),
                     "meta": meta})


def generate_geo(n_convs: int, seed: int = SEED) -> tuple[pa.Table, pa.Table]:
    """(conv_geo, places): conversation coordinates + a small places table
    for the reverse-geocode memo (S8/M21). Coordinates avoid exact integer
    values so ``floor`` cells are unambiguous; some cells contain no place
    (those conversations legitimately drop from the geocode output)."""
    rng = np.random.RandomState(seed + 29)
    conv_id = np.char.add("conv", np.char.zfill(
        np.arange(n_convs).astype(str), 8))
    lat = 30.0 + rng.random_sample(n_convs) * 15.0 + 1e-4
    lon = -120.0 + rng.random_sample(n_convs) * 40.0 + 1e-4
    conv_geo = pa.table({
        "conv_id": pa.array(conv_id.tolist(), pa.string()),
        "lat": pa.array(lat, pa.float64()),
        "lon": pa.array(lon, pa.float64())})
    n_places = 300
    plat = 30.0 + rng.random_sample(n_places) * 15.0 + 1e-4
    plon = -120.0 + rng.random_sample(n_places) * 40.0 + 1e-4
    places = pa.table({
        "place_id": pa.array(np.arange(1, n_places + 1), pa.int64()),
        "name": pa.array([f"place {i:03d}" for i in range(n_places)],
                         pa.string()),
        "lat": pa.array(plat, pa.float64()),
        "lon": pa.array(plon, pa.float64())})
    return conv_geo, places


def generate_admin_hierarchy(places: pa.Table) -> pa.Table:
    """Deterministic admin hierarchy over the places table (the analog of
    the reference's city→county→state→country Wikidata chain,
    ``location_from_wikidata.py:401-454``): every geocodable place is a
    city with a county parent; 30 counties → 10 states → 2 countries.
    ``population`` is NULL for every 7th city (the reference emits the
    population triple only when present)."""
    pids = places["place_id"].to_numpy()
    rows = []  # (place_id, label, level, parent_id, population)
    for pid in pids.tolist():
        pop = None if pid % 7 == 0 else 1000 + (pid * 137) % 1_000_000
        rows.append((pid, f"place {pid - 1:03d}", "city",
                     1001 + (pid % 30), pop))
    for i in range(30):
        pop = None if i % 2 else 50_000 + i * 977
        rows.append((1001 + i, f"county {i:02d}", "county",
                     2001 + (i % 10), pop))
    for i in range(10):
        rows.append((2001 + i, f"state {i:02d}", "state",
                     3001 + (i % 2), 2_000_000 + i * 55_001))
    for i in range(2):
        rows.append((3001 + i, f"country {i}", "country",
                     None, 50_000_000 + i * 7))
    return pa.table({
        "place_id": pa.array([r[0] for r in rows], pa.int64()),
        "label": pa.array([r[1] for r in rows], pa.string()),
        "level": pa.array([r[2] for r in rows], pa.string()),
        "parent_id": pa.array([r[3] for r in rows], pa.int64()),
        "population": pa.array([r[4] for r in rows], pa.int64())})


def fixture_dir(sf_name: str) -> str:
    return os.path.join(CACHE_ROOT, FORMAT_VERSION, sf_name)


def ensure_fixtures(sf_dir_or_name: str) -> str:
    """Generate (once) and return the fixture dir for a scale-factor name.

    Accepts either a bare profile name ("sf0.01") or a testdata dir path
    ("/root/testdata/sf0.01"). Writes are atomic (tmp dir + rename) so
    concurrent callers are safe.
    """
    sf_name = os.path.basename(os.path.normpath(sf_dir_or_name))
    if sf_name not in PROFILES:
        sf_name = "sf0.001"
    out = fixture_dir(sf_name)
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    tmp = out + f".tmp{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)

    alias_rows, vocab_rows, _pool = build_vocab_tables()
    ent_rows, th_rows, overrides = build_kg_snapshot()

    # MULTI-FILE transcripts: this Ray version issues one read task per
    # parquet FILE (a single 2M-row file read single-threaded for ~15 s and
    # starved every fused stage; override_num_blocks only adds a SplitBlocks
    # postprocess, measured in ds.stats()). 64k rows per part ~= 32 files at
    # bench scale -> the read itself fans out. This is also the honest 100 TB
    # layout: real corpora are many files.
    tdir = os.path.join(tmp, "transcripts.parquet")
    os.makedirs(tdir)
    tab = generate_transcripts(PROFILES[sf_name])
    per = 65_536
    for i in range(0, tab.num_rows, per):
        pq.write_table(tab.slice(i, per),
                       os.path.join(tdir, f"part-{i // per:05d}.parquet"),
                       row_group_size=16_384)
    pq.write_table(pa.table({
        "surface_norm": [r[0] for r in alias_rows],
        "canonical": [r[1] for r in alias_rows]}),
        os.path.join(tmp, "alias_table.parquet"))
    pq.write_table(pa.table({
        "surface_form": [r[0] for r in vocab_rows],
        "canonical": [r[1] for r in vocab_rows]}),
        os.path.join(tmp, "vocab.parquet"))
    pq.write_table(pa.table({
        "entity_id": [r[0] for r in ent_rows],
        "label": [r[1] for r in ent_rows],
        "aliases": pa.array([r[2] for r in ent_rows], pa.list_(pa.string())),
        "type_id": [r[3] for r in ent_rows]}),
        os.path.join(tmp, "entities.parquet"))
    pq.write_table(pa.table({
        "type_id": [r[0] for r in th_rows],
        "super_type_id": [r[1] for r in th_rows]}),
        os.path.join(tmp, "type_hierarchy.parquet"))
    pq.write_table(pa.table({
        "surface_norm": [r[0] for r in overrides],
        "entity_id": [r[1] for r in overrides]}),
        os.path.join(tmp, "manual_overrides.parquet"))
    pq.write_table(generate_conv_meta(PROFILES[sf_name]),
                   os.path.join(tmp, "conv_meta.parquet"))
    conv_geo, places = generate_geo(PROFILES[sf_name])
    pq.write_table(conv_geo, os.path.join(tmp, "conv_geo.parquet"))
    pq.write_table(places, os.path.join(tmp, "places.parquet"))
    pq.write_table(generate_admin_hierarchy(places),
                   os.path.join(tmp, "admin_hierarchy.parquet"))

    with open(os.path.join(tmp, "_COMPLETE"), "w") as f:
        f.write("ok\n")
    try:
        os.rename(tmp, out)
    except OSError:
        # another process won the race; use its output
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
    return out


# --------------------------------------------------------------------------
# Large synthetic DOCUMENTS corpus — scale evidence for the dedup family
# --------------------------------------------------------------------------
# The driver's testdata documents table tops out at ~5k docs (sf0.1), which
# times the dedup operators as pure scheduling overhead. This profile
# generates a corpus 40x bigger with the same schema and a PLANTED dup
# structure (every 37th doc an exact dup of its predecessor, every 41st a
# one-word-edit near dup) and zipf-skewed sources, so `bench.py --docs`
# measures the actual shuffle/verify machinery at meaningful scale.

DOCS_PROFILES = {"docsbench": 200_000}

_SYL = ["ra", "mo", "ti", "ne", "ko", "su", "va", "le",
        "di", "pa", "zu", "qe", "fo", "hi", "ga", "wy"]
_DOC_POOL = np.array([a + b + c for a in _SYL for b in _SYL for c in _SYL],
                     dtype="U12")  # 4096 distinct 6-char words


def generate_documents(n_docs: int, seed: int = SEED) -> pa.Table:
    rng = np.random.RandomState(seed)
    lengths = rng.randint(30, 90, size=n_docs)
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    flat = _DOC_POOL[rng.randint(0, len(_DOC_POOL), size=int(offsets[-1]))]
    texts = [" ".join(flat[offsets[i]:offsets[i + 1]])
             for i in range(n_docs)]
    for i in range(1, n_docs):
        if i % 37 == 1:
            texts[i] = texts[i - 1]                   # exact dup
        elif i % 41 == 2:
            ws = texts[i - 1].split(" ")              # near dup: 1-word edit
            ws[len(ws) // 2] = "edited"
            texts[i] = " ".join(ws)
    # zipf-ish source skew across 20 buckets (source s_k with weight 1/(k+1))
    w = 1.0 / np.arange(1, 21)
    src_idx = rng.choice(20, size=n_docs, p=w / w.sum())
    return pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n_docs, pa.string()),
        "source": pa.array(np.char.add("src", src_idx.astype(str)),
                           pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())})


def ensure_docs_fixture(name: str = "docsbench") -> str:
    """Generate (once) the large documents fixture; returns a dir whose
    ``documents.parquet`` is a DIRECTORY of part files (read fan-out, same
    rationale as the transcripts layout)."""
    out = os.path.join(CACHE_ROOT, FORMAT_VERSION, name)
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    tmp = out + f".tmp{os.getpid()}"
    ddir = os.path.join(tmp, "documents.parquet")
    os.makedirs(ddir, exist_ok=True)
    tab = generate_documents(DOCS_PROFILES[name])
    per = 8_192
    for i in range(0, tab.num_rows, per):
        pq.write_table(tab.slice(i, per),
                       os.path.join(ddir, f"part-{i // per:05d}.parquet"),
                       row_group_size=4_096)
    with open(os.path.join(tmp, "_COMPLETE"), "w") as f:
        f.write("ok\n")
    try:
        os.rename(tmp, out)
    except OSError:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
    return out
