#!/usr/bin/env python3
"""Generate a builder-side sf1 decade at target/testdata/sf1.

The driver generates /root/testdata/sf{0.001,0.01,0.1} (read-only; seed 42).
The round-11 verdict asked for a FOURTH scaling decade; the driver's
generator is not available, so this reproduces the same schema and the
measured marginal/joint distributions of the driver data at 10x sf0.1:

  - cardinalities: the observed 10x-per-decade pattern (customer 150k,
    supplier 10k, part 200k, orders 1.5M, lineitem ~6M via
    lines-per-order ~ Poisson(4) truncated >0, events 1M over 15k users,
    documents 50k, embeddings 20k);
  - lineitem: quantity ~ U{1..50}, discount ~ U{0.00..0.10 step .01},
    tax ~ U{0.00..0.08}, extendedprice = quantity * U(900, 2100),
    returnflag/linestatus independent uniform, shipdate = U(orderdate
    range) + U{1..95} days (the measured ±2400-day own-order delta with
    mean +48);
  - events: ts ~ U(2024-01-01, 2024-01-31), value ~ Exp(mean 50),
    props = {"k": U{0..99}};
  - documents: U{10..99} words from the observed 31-word vocab,
    lang weights (en .4, others .15), 20 uniform sources, ~0.15% exact
    duplicates injected (the driver data carries 8/5000);
  - embeddings: 64-dim unit-normalized gaussian float32, labels U{0..9}.

Seed 43 — deliberately NOT the driver's 42: this is distribution-matched
synthetic data for the runtime-vs-rows envelope, not a byte replica, and
the scaling report labels it as builder-generated.
"""
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.environ.get("GRAFT_SF1_OUT", "/root/repo/target/testdata/sf1")
os.makedirs(OUT, exist_ok=True)
rng = np.random.default_rng(43)

SF = 10  # vs sf0.1
N_CUST = 15000 * SF
N_SUPP = 1000 * SF
N_PART = 20000 * SF
N_ORDERS = 150000 * SF
N_EVENTS = 100000 * SF
N_USERS = 1500 * SF
N_DOCS = 5000 * SF
N_EMB = 2000 * SF

def write(name, table):
    pq.write_table(table, f"{OUT}/{name}.parquet")
    print(f"[gen_sf1] {name}: {table.num_rows} rows", flush=True)

# region / nation: fixed dimension tables, same at every sf
write("region", pa.table({
    "r_regionkey": pa.array(range(5), pa.int32()),
    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
}))
write("nation", pa.table({
    "n_nationkey": pa.array(range(25), pa.int32()),
    "n_name": [f"NATION_{i}" for i in range(25)],
    "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
}))

segs = ["MACHINERY", "HOUSEHOLD", "AUTOMOBILE", "BUILDING", "FURNITURE"]
write("customer", pa.table({
    "c_custkey": pa.array(range(N_CUST), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
    "c_nationkey": pa.array(rng.integers(0, 25, N_CUST), pa.int32()),
    "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUST), 2),
    "c_mktsegment": pa.array(np.array(segs)[rng.integers(0, 5, N_CUST)]),
}))

write("supplier", pa.table({
    "s_suppkey": pa.array(range(N_SUPP), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
    "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP), pa.int32()),
    "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPP), 2),
}))

adjs = ["large", "hot", "blue", "small", "dark", "cold", "light", "round"]
nouns = ["ring", "bolt", "cog", "gear", "tube", "disk", "plate", "rod"]
ptypes = ["SMALL", "ECONOMY", "LARGE", "STANDARD", "MEDIUM", "PROMO"]
pa_i = rng.integers(0, 8, N_PART)
pn_i = rng.integers(0, 8, N_PART)
write("part", pa.table({
    "p_partkey": pa.array(range(N_PART), pa.int64()),
    "p_name": [f"{adjs[a]} {nouns[n]}" for a, n in zip(pa_i, pn_i)],
    "p_brand": [f"Brand#{b}" for b in rng.integers(1, 26, N_PART)],
    "p_type": pa.array(np.array(ptypes)[rng.integers(0, 6, N_PART)]),
    "p_size": pa.array(rng.integers(1, 51, N_PART), pa.int32()),
    "p_retailprice": np.round(rng.uniform(900, 1000, N_PART), 2),
}))

DAY_US = 86400_000_000
od_lo = np.datetime64("1995-01-01", "us").astype("int64")
od_hi = np.datetime64("2001-08-01", "us").astype("int64")
o_days = (od_hi - od_lo) // DAY_US
orderdate = od_lo + rng.integers(0, o_days + 1, N_ORDERS) * DAY_US
prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
write("orders", pa.table({
    "o_orderkey": pa.array(range(N_ORDERS), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORDERS), pa.int64()),
    "o_orderstatus": pa.array(np.array(["O", "P", "F"])[rng.integers(0, 3, N_ORDERS)]),
    "o_totalprice": np.round(rng.uniform(1000, 500000, N_ORDERS), 2),
    "o_orderdate": pa.array(orderdate, pa.timestamp("us")),
    "o_orderpriority": pa.array(np.array(prios)[rng.integers(0, 5, N_ORDERS)]),
}))

# lineitem: Poisson(4) lines per order, zero-line orders dropped
nlines = rng.poisson(4.0, N_ORDERS)
okeys = np.repeat(np.arange(N_ORDERS, dtype=np.int64), nlines)
NL = okeys.size
lineno = np.concatenate([np.arange(1, n + 1) for n in nlines if n > 0])
qty = rng.integers(1, 51, NL).astype(np.float64)
shipdate = (od_lo + rng.integers(0, o_days + 1, NL) * DAY_US
            + rng.integers(1, 96, NL) * DAY_US)
write("lineitem", pa.table({
    "l_orderkey": pa.array(okeys, pa.int64()),
    "l_partkey": pa.array(rng.integers(0, N_PART, NL), pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, N_SUPP, NL), pa.int64()),
    "l_linenumber": pa.array(lineno, pa.int32()),
    "l_quantity": qty,
    "l_extendedprice": np.round(qty * rng.uniform(900, 2100, NL), 2),
    "l_discount": np.round(rng.integers(0, 11, NL) * 0.01, 2),
    "l_tax": np.round(rng.integers(0, 9, NL) * 0.01, 2),
    "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, NL)]),
    "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, NL)]),
    "l_shipdate": pa.array(shipdate, pa.timestamp("us")),
}))

ev_lo = np.datetime64("2024-01-01", "us").astype("int64")
ev_hi = np.datetime64("2024-01-31", "us").astype("int64")
etypes = ["click", "view", "purchase", "signup", "error"]
ks = rng.integers(0, 100, N_EVENTS)
write("events", pa.table({
    "event_id": pa.array(range(N_EVENTS), pa.int64()),
    "ts": pa.array(rng.integers(ev_lo, ev_hi, N_EVENTS), pa.timestamp("us")),
    "user_id": pa.array(rng.integers(0, N_USERS, N_EVENTS), pa.int64()),
    "event_type": pa.array(np.array(etypes)[rng.integers(0, 5, N_EVENTS)]),
    "value": rng.exponential(50.0, N_EVENTS),
    "props": [f'{{"k": {k}}}' for k in ks],
}))

vocab = np.array("""a agg batch big column customer data dup fast filter group
hash join key line merge order part query row scan slow small sort spark
stream table the value vector window""".split())
langs = np.array(["en", "fr", "de", "zh", "es"])
lang_w = np.array([0.4, 0.15, 0.15, 0.15, 0.15])
doc_lens = rng.integers(10, 100, N_DOCS)
texts = [" ".join(vocab[rng.integers(0, vocab.size, n)]) for n in doc_lens]
# exact-duplicate injection at the driver data's observed rate (~0.15%)
for i in rng.choice(np.arange(1, N_DOCS), size=int(N_DOCS * 0.0016), replace=False):
    texts[i] = texts[rng.integers(0, i)]
write("documents", pa.table({
    "doc_id": pa.array(range(N_DOCS), pa.int64()),
    "text": texts,
    "lang": pa.array(langs[rng.choice(5, N_DOCS, p=lang_w)]),
    "source": [f"src{s}" for s in rng.integers(0, 20, N_DOCS)],
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
}))

emb = rng.normal(size=(N_EMB, 64)).astype(np.float32)
emb /= np.linalg.norm(emb, axis=1, keepdims=True)
write("embeddings", pa.table({
    "vec_id": pa.array(range(N_EMB), pa.int64()),
    "embedding": pa.array(list(emb), pa.list_(pa.float32())),
    "label": pa.array(rng.integers(0, 10, N_EMB), pa.int32()),
}))

with open(f"{OUT}/MANIFEST.json", "w") as f:
    json.dump({"sf": 1, "seed": 43, "generator": "tools/gen_sf1.py",
               "note": "builder-generated, distribution-matched to the "
                       "driver's sf0.1; NOT driver data"}, f)
print("[gen_sf1] done", flush=True)
