#!/usr/bin/env python3
"""Deterministic sf1 testdata (10x sf0.1) for scale-proofing.

The driver's generator stops at sf0.1; round-8 evidence needs one decade
more. Relational tables scale by key-offset replication (referential
integrity preserved: every replica's foreign keys point at that
replica's dimension copy; names that encode the key are regenerated so
name-blocked operators — record linkage, fuzzy join — see 10x the
entities, not 10 copies of each entity). Documents are generated fresh
from the sf0.1 corpus's empirical vocabulary/length/lang/source
distributions (the near-dup structure the dedup queries exercise is
planted by the queries themselves via docsAug, so the base corpus must
be ~iid, exactly like the driver's); embeddings are fresh iid unit
vectors like the originals. Seed fixed; output under /tmp/testdata/sf1.

Usage: python3 scripts/gen_sf1.py [outDir] [reps]

`reps` (default 10) is the replication factor over sf0.1 — reps=30
builds an sf3 for second-decade scaling probes.
"""
import duckdb, os, random, sys, collections

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata/sf1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
K_CUST, K_SUPP, K_PART, K_ORD = 15000, 1000, 20000, 150000
K_EVENT, K_USER = 100000, 1500

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
rnd = random.Random(42)

def write(name, sql):
    con.execute(f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{OUT}/{name}.parquet')").fetchone()[0]
    print(f"{name}: {n} rows")

def src(name):
    return f"read_parquet('{SRC}/{name}.parquet')"

reps = f"(SELECT unnest(range({REPS})) AS rep)"

# fixed-size dims: verbatim
write("region", f"SELECT * FROM {src('region')}")
write("nation", f"SELECT * FROM {src('nation')}")

write("customer", f"""
  SELECT c_custkey + rep * {K_CUST} AS c_custkey,
         printf('Customer#%09d', c_custkey + rep * {K_CUST}) AS c_name,
         c_nationkey, c_acctbal, c_mktsegment
  FROM {src('customer')} CROSS JOIN {reps}
  ORDER BY c_custkey""")

write("supplier", f"""
  SELECT s_suppkey + rep * {K_SUPP} AS s_suppkey,
         printf('Supplier#%09d', s_suppkey + rep * {K_SUPP}) AS s_name,
         s_nationkey, s_acctbal
  FROM {src('supplier')} CROSS JOIN {reps}
  ORDER BY s_suppkey""")

write("part", f"""
  SELECT p_partkey + rep * {K_PART} AS p_partkey,
         p_name, p_brand, p_type, p_size, p_retailprice
  FROM {src('part')} CROSS JOIN {reps}
  ORDER BY p_partkey""")

write("orders", f"""
  SELECT o_orderkey + rep * {K_ORD} AS o_orderkey,
         o_custkey + rep * {K_CUST} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')} CROSS JOIN {reps}
  ORDER BY o_orderkey""")

write("lineitem", f"""
  SELECT l_orderkey + rep * {K_ORD} AS l_orderkey,
         l_partkey + rep * {K_PART} AS l_partkey,
         l_suppkey + rep * {K_SUPP} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM {src('lineitem')} CROSS JOIN {reps}
  ORDER BY l_orderkey""")

write("events", f"""
  SELECT event_id + rep * {K_EVENT} AS event_id, ts,
         user_id + rep * {K_USER} AS user_id,
         event_type, value, props
  FROM {src('events')} CROSS JOIN {reps}
  ORDER BY event_id""")

# --- documents: fresh corpus from empirical distributions -------------
docs = con.execute(
    f"SELECT doc_id, text, lang, source FROM {src('documents')} ORDER BY doc_id").fetchall()
vocab = collections.Counter()
lengths, langs, sources = [], [], []
for _, text, lang, source in docs:
    words = text.split(" ")
    vocab.update(words)
    lengths.append(len(words))
    langs.append(lang)
    sources.append(source)
words, weights = zip(*sorted(vocab.items()))
n_new = len(docs) * (REPS - 1)
out_rows = list(docs)
next_id = len(docs)
for i in range(n_new):
    if out_rows and rnd.random() < 0.002:          # exact-dup rate ~ the original's 8/5000
        _, text, lang, source = out_rows[rnd.randrange(len(out_rows))]
    else:
        n = lengths[rnd.randrange(len(lengths))]
        text = " ".join(rnd.choices(words, weights=weights, k=n))
        lang = langs[rnd.randrange(len(langs))]
        source = sources[rnd.randrange(len(sources))]
    out_rows.append((next_id, text, lang, source))
    next_id += 1
con.execute("CREATE TABLE docs_new (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR)")
con.executemany("INSERT INTO docs_new VALUES (?, ?, ?, ?)", out_rows)
write("documents", "SELECT doc_id, text, lang, source, length(text) AS n_chars FROM docs_new ORDER BY doc_id")

# --- embeddings: fresh iid unit vectors, labels empirical -------------
emb = con.execute(
    f"SELECT vec_id, embedding, label FROM {src('embeddings')} ORDER BY vec_id").fetchall()
dim = len(emb[0][1])
lab = [r[2] for r in emb]
new_emb = list(emb)
for i in range(len(emb) * (REPS - 1)):
    v = [rnd.gauss(0.0, 1.0) for _ in range(dim)]
    nrm = sum(x * x for x in v) ** 0.5
    new_emb.append((len(emb) + i, [x / nrm for x in v], lab[rnd.randrange(len(lab))]))
con.execute("CREATE TABLE emb_new (vec_id BIGINT, embedding FLOAT[], label BIGINT)")
con.executemany("INSERT INTO emb_new VALUES (?, ?, ?)", new_emb)
write("embeddings", "SELECT vec_id, CAST(embedding AS FLOAT[]) AS embedding, CAST(label AS INT) AS label FROM emb_new ORDER BY vec_id")

print("done:", OUT)
