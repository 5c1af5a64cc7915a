"""Assemble bench/results_v5e_sparse_r2.csv from the partial run logs."""
hdr = None
rows = []
seen = set()
for path in ("/tmp/sparse_bf2.csv",
             "/tmp/sparse_f64c.csv", "/tmp/sparse_f64b.csv",
             "/tmp/sparse_r2.csv",
             "/tmp/sparse_f64.csv", "/tmp/sparse_bf.csv"):
    try:
        for line in open(path):
            line = line.strip()
            if not line:
                continue
            if line.startswith("float_type"):
                hdr = line
                continue
            key = tuple(line.split(",")[:4])
            if key not in seen:
                seen.add(key)
                rows.append(line)
    except FileNotFoundError:
        pass
order = {"float16": 0, "bfloat16": 1, "float32": 2, "float64": 3}
rows.sort(key=lambda r: (order[r.split(",")[0]], int(r.split(",")[2]),
                         float(r.split(",")[3])))
with open("bench/results_v5e_sparse_r2.csv", "w") as f:
    f.write(hdr + "\n")
    for r in rows:
        f.write(r + "\n")
print(len(rows), "rows")
