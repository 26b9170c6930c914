"""Vocabulary, namespaces and thresholds for the Ray-Data KG engine.

The reference (``/root/reference``) hard-codes seven RDF namespaces
(``Code/create_yelp_nt_files.py:13-19``) and a predicate vocabulary chosen by
a ``match`` over record keys (``Code/UtilityFunctions/schema_functions.py:12-76``).
We keep the same shape — a small, fixed, data-driven vocabulary — re-targeted
at the transcript payload mandated by ``BASELINE.json input_hint``:
``(conv_id, turn_idx, role, text, tool, ts)``.

Everything here is plain data so it can be broadcast to Ray workers cheaply
(captured in the map-fn closure; a few KB).
"""

from __future__ import annotations

# --- RDF namespaces (standard, public) -------------------------------------
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
XSD = "http://www.w3.org/2001/XMLSchema#"
SCHEMA = "https://schema.org/"
# Engine-local namespaces (analog of the reference's yelpont/yelpvoc/yelpent,
# create_yelp_nt_files.py:13-19).
ENT = "http://example.org/yckg/entity/"
PROP = "http://example.org/yckg/prop/"
WD = "http://www.wikidata.org/entity/"

RDF_TYPE = RDF + "type"
RDFS_LABEL = RDFS + "label"
RDFS_SUBCLASS_OF = RDFS + "subClassOf"

# --- predicate vocabulary for transcript turns ------------------------------
# Analog of get_schema_predicate (schema_functions.py:12-76): fixed mapping
# from input keys to (predicate IRI, XSD datatype).
PRED_IS_PART_OF = SCHEMA + "isPartOf"        # turn -> conversation (FK rewrite, M11)
PRED_POSITION = SCHEMA + "position"          # turn_idx (xsd:integer)
PRED_ROLE = PROP + "role"                    # role literal (xsd:string)
PRED_USES_TOOL = PROP + "usesTool"           # turn -> tool IRI
PRED_DATE_CREATED = SCHEMA + "dateCreated"   # ts (xsd:dateTime, ISO-ified; M9)
PRED_TEXT = SCHEMA + "text"                  # raw turn text (per-turn equality invariant)
PRED_MENTIONS = SCHEMA + "mentions"          # turn -> mention IRI (category analog)
PRED_SAME_AS = SCHEMA + "sameAs"             # mention -> external entity (wiki link analog)
PRED_INSTANCE_OF = PROP + "instanceOf"       # entity -> type (P31 analog)

CLASS_TURN = SCHEMA + "Message"
CLASS_CONVERSATION = SCHEMA + "Conversation"
CLASS_TOOL = SCHEMA + "SoftwareApplication"
CLASS_MENTION = ENT + "class/Mention"

# --- place enrichment (reference location_from_wikidata.py:401-454) --------
# The reference emits schema:location onto businesses plus label /
# instance-of / population / admin-containment triples for the resolved
# place hierarchy (city -> county -> state -> country), using the public
# Wikidata class QIDs below. Same vocabulary here, over the conv_geo /
# admin_hierarchy fixture tables.
PRED_LOCATION = SCHEMA + "location"      # conversation -> place IRI
PRED_POPULATION = PROP + "population"    # place population (P1082 analog)
PRED_CONTAINED_IN = PROP + "containedIn"  # place -> parent admin (P131 analog)
CLASS_CITY = WD + "Q486972"      # human settlement (ref uses this for city)
CLASS_COUNTY = WD + "Q28575"     # county
CLASS_STATE = WD + "Q7275"       # state
CLASS_COUNTRY = WD + "Q6256"     # country
PLACE_LEVEL_CLASS = {"city": CLASS_CITY, "county": CLASS_COUNTY,
                     "state": CLASS_STATE, "country": CLASS_COUNTRY}

XSD_STRING = XSD + "string"
XSD_INTEGER = XSD + "integer"
XSD_DATETIME = XSD + "dateTime"
XSD_DECIMAL = XSD + "decimal"
XSD_BOOLEAN = XSD + "boolean"

# Values treated as "absent" and routed to the dead-letter channel instead of
# emitting a triple — exactly the reference's none-filter set
# (create_yelp_nt_files.py:112-114).
NONE_VALUES = ("None", "none", "null", "Null", "NULL", "")

# --- linking ---------------------------------------------------------------
# Entity-linking decision threshold: top-1 cosine >= LINK_THRESHOLD, analog of
# the 0.4 threshold on the category->Schema.org mapper
# (category_mappings.py:65,98). Our hashed-ngram embeddings are sharper, so a
# higher cut keeps precision at 10^12 scale.
LINK_THRESHOLD = 0.60
NGRAM_N = 3          # char n-gram size for blocking + hashed embeddings
EMBED_DIM = 64       # feature-hashing dimension for the deterministic embedder
# Encoder behind the link scorer (stages/link.get_encoder): "hashed" = the
# deterministic feature-hashing embedder (container-safe); "transformer" =
# a real SentenceTransformer bi-encoder when the package is importable.
LINK_ENCODER = "hashed"

# The normalization regex shared by the engine and the DuckDB oracle. Both
# pyarrow.compute.replace_substring_regex and DuckDB regexp_replace use RE2,
# so one pattern serves both. Fixes the reference's sanitizer inconsistency
# (create_yelp_nt_files.py:93 vs create_schema_wiki_mapping.py:64) by using a
# single rule everywhere (SURVEY.md M10).
NORMALIZE_PATTERN = r"[ &/'()\.\-,]+"
# camelCase boundary split (reference string_functions.py:40-41, whose
# lookbehind regex RE2 can't run; the lower/digit->upper boundary form is
# equivalent on simple camel words like WebSearch / CodeInterpreter).
CAMEL_PATTERN = r"([a-z0-9])([A-Z])"

# Triples-table schema (FIXTURES.md §4).
TRIPLE_COLUMNS = ["subj", "pred", "obj", "obj_is_literal", "obj_datatype"]

# The closed (pred, obj_is_literal, obj_datatype) vocabulary this engine's
# stages emit — the analog of the reference's fixed predicate match table
# (schema_functions.py:12-76). Passed to materialize(known_combos=...) so
# the rank encoding skips a full pre-scan; materialize fails loudly if a
# stage ever emits a combo missing from this list.
# IRI namespace prefixes stripped from subj/obj during the materialize sort
# and replaced by an int8 bucket (stages/materialize.py:_prefix_encode). The
# set MUST be prefix-free (no entry a prefix of another) — that property is
# what makes (bucket, suffix) ordering identical to full-string ordering.
# Strings matching no prefix (e.g. arbitrary text literals) are interleaved
# via even bucket ids, so the list need not be exhaustive — only prefix-free.
SORT_PREFIXES: list[str] = sorted([
    ENT + "class/",
    ENT + "conversation/",
    ENT + "mention/",
    ENT + "tool/",
    ENT + "turn/",
    ENT + "type/",
    WD,
    SCHEMA,
])

KNOWN_COMBOS: list[tuple[str, bool, str | None]] = [
    (RDF_TYPE, False, None),
    (RDFS_LABEL, True, XSD_STRING),
    (RDFS_SUBCLASS_OF, False, None),
    (PRED_IS_PART_OF, False, None),
    (PRED_POSITION, True, XSD_INTEGER),
    (PRED_ROLE, True, XSD_STRING),
    (PRED_USES_TOOL, False, None),
    (PRED_DATE_CREATED, True, XSD_DATETIME),
    (PRED_TEXT, True, XSD_STRING),
    (PRED_MENTIONS, False, None),
    (PRED_SAME_AS, False, None),
    (PRED_INSTANCE_OF, False, None),
]
