#!/usr/bin/env python3
"""Borderline-pair proof for the q13/q54/q55 oracle decoupling.

Builds a documents corpus with ~60 planted near-dup pairs at J ~ 0.52 —
right at the 0.5 threshold, where a 32x4-band LSH misses a pair with
probability ~9% — runs the engine (graft.Verify) on it, and compares
q13/q54/q55 against their generated DuckDB oracles. Because the oracles
mirror the band keys bit-for-bit, engine and oracle must agree EXACTLY,
including on the pairs that escape banding; the old brute-force-all-pairs
oracle would have flagged every escaped pair as a miss.

Usage: python3 tools/borderline_check.py [workdir]
Exits non-zero on any engine/oracle mismatch, or if zero pairs escaped
banding (corpus failed to exercise the borderline case).
"""
import sys, os, json, glob, random, subprocess
import duckdb
import pandas as pd

QUERIES = ["q13_dedup_minhash", "q54_curation_funnel", "q55_neardup_components"]

def build_corpus(path):
    random.seed(42)
    words = [f"w{i:03d}" for i in range(2000)]
    rows = []
    did = 1
    def add(tokens):
        nonlocal did
        text = " ".join(tokens)
        rows.append({"doc_id": did, "text": text, "lang": "en",
                     "source": "src1", "n_chars": len(text)})
        did += 1
    # background: 200 docs of 60 tokens (distinct enough to stay far
    # below the threshold pairwise)
    for _ in range(200):
        add(random.choices(words, k=60))
    # 60 borderline pairs: A = 40 distinct tokens (38 shingles),
    # B = A[:28] + 12 fresh tokens -> 26 shared shingles of 38 each,
    # J = 26 / (76 - 26) = 0.52
    for _ in range(60):
        a = random.sample(words, 52)
        add(a[:40])
        add(a[:28] + a[40:52])
    df = pd.DataFrame(rows)
    os.makedirs(path, exist_ok=True)
    df.to_parquet(f"{path}/documents.parquet", index=False)
    return df

def shingles(text):
    toks = [t for t in text.lower().split() if t]
    if not toks:
        return set()
    if len(toks) < 3:
        return {" ".join(toks)}
    return {" ".join(toks[i:i+3]) for i in range(len(toks) - 2)}

def brute_force_pairs(df, min_j=0.5):
    sh = {r.doc_id: shingles(r.text) for r in df.itertuples() if r.text.strip()}
    ids = sorted(sh)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i+1:]:
            inter = len(sh[a] & sh[b])
            union = len(sh[a]) + len(sh[b]) - inter
            if union and inter >= min_j * union:
                out.add((a, b))
    return out

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)

def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/borderline"
    sf_dir, out_dir = f"{work}/sf", f"{work}/out"
    df = build_corpus(sf_dir)
    print(f"corpus: {len(df)} docs at {sf_dir}")
    # engine run (non-documents queries fail gracefully inside Verify)
    subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out_dir}"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        check=True, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    failures = 0
    for name in QUERIES:
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no engine output")
            failures += 1
            continue
        spark = canon(pd.concat(map(pd.read_parquet, files)))
        oracle = canon(con.execute(oracles[name]).df())
        if list(spark.columns) != list(oracle.columns) or len(spark) != len(oracle):
            print(f"FAIL {name}: shape spark={spark.shape} oracle={oracle.shape}")
            failures += 1
        elif not spark.reset_index(drop=True).equals(oracle.reset_index(drop=True)):
            print(f"FAIL {name}: value mismatch")
            failures += 1
        else:
            print(f"OK   {name} ({len(spark)} rows, engine == mirrored oracle)")
    # prove the corpus exercised the borderline case: pairs at J >= 0.5
    # that the banding missed (old brute-force oracle would flag these)
    brute = brute_force_pairs(df)
    engine = set(map(tuple, pd.concat(
        map(pd.read_parquet, sorted(glob.glob(f"{out_dir}/q13_dedup_minhash/*.parquet")))
    )[["id_a", "id_b"]].itertuples(index=False)))
    escaped = brute - engine
    print(f"brute-force J>=0.5 pairs: {len(brute)}, engine pairs: {len(engine)}, "
          f"escaped banding: {len(escaped)}")
    if not escaped:
        print("FAIL: zero escaped pairs — corpus did not exercise the borderline case")
        failures += 1
    if engine - brute:
        print(f"FAIL: engine emitted {len(engine - brute)} pairs below the exact threshold")
        failures += 1
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
