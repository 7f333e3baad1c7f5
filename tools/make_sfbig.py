"""Builder-side replica of the driver's sf1.0 scale (the driver regenerates
its own; this is only for A/B measurement at the right scale): 50k documents
(31-word vocab, 10-100 words, ~4.5% near-dup mutations, ~0.2% exact dups),
20k unit-norm 64-dim embeddings in 10 label blocks with ~5% planted
near-dup vectors. ONE row group each (matches the driver layout that makes
under-split scans matter). Deterministic, seed 7."""
import numpy as np
import pandas as pd
import os

OUT = "/tmp/sfbig"
os.makedirs(OUT, exist_ok=True)
rng = np.random.RandomState(7)

VOCAB = np.array(
    "a agg batch big column customer data dup fast filter group hash join key "
    "line merge order part query row scan slow small sort spark stream table "
    "the value vector window".split()
)
N = 50_000
texts = []
for i in range(N):
    r = rng.rand()
    if i > 10 and r < 0.045:  # near-dup of a recent doc
        base = texts[i - 1 - rng.randint(0, min(i, 500))].split(" ")
        k = rng.randint(2, 6)
        for p in rng.randint(0, len(base), k):
            base[p] = VOCAB[rng.randint(0, 31)]
        texts.append(" ".join(base))
    elif i > 10 and r < 0.047:  # exact dup
        texts.append(texts[i - 1 - rng.randint(0, min(i, 500))])
    else:
        n = rng.randint(10, 101)
        texts.append(" ".join(VOCAB[rng.randint(0, 31, n)]))
langs = rng.choice(["en", "zh", "es", "fr", "de"], N, p=[0.41, 0.15, 0.15, 0.15, 0.14])
docs = pd.DataFrame(
    {
        "doc_id": np.arange(N, dtype=np.int64),
        "text": texts,
        "lang": langs,
        "source": [f"src{i % 20}" for i in range(N)],
    }
)
docs["n_chars"] = docs.text.str.len().astype(np.int64)
docs.to_parquet(f"{OUT}/documents.parquet", index=False, row_group_size=N)
print("documents:", len(docs), "bytes", os.path.getsize(f"{OUT}/documents.parquet"))

M, D, L = 20_000, 64, 10
centers = rng.randn(L, D)
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
labels = rng.randint(0, L, M).astype(np.int32)
vecs = centers[labels] * 0.6 + rng.randn(M, D) * 0.35
# plant near-dups: ~5% of rows copy an earlier same-label row + tiny noise
for i in range(1, M):
    if rng.rand() < 0.05:
        j = rng.randint(0, i)
        labels[i] = labels[j]
        vecs[i] = vecs[j] + rng.randn(D) * 0.01
vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
emb = pd.DataFrame(
    {
        "vec_id": np.arange(M, dtype=np.int64),
        "embedding": [v.astype(np.float32) for v in vecs],
        "label": labels,
    }
)
emb.to_parquet(f"{OUT}/embeddings.parquet", index=False, row_group_size=M)
print("embeddings:", len(emb), "bytes", os.path.getsize(f"{OUT}/embeddings.parquet"))
