#!/usr/bin/env python3
"""INDEPENDENT zarr-v2 store generator — the foreign-writer interop proof.

Every zarr/AnnData fixture the JVM readers consume was, until round 12,
written by this repo's own writers; a reader bug mirrored in the writer
would be invisible (the "self-consistent readers" risk the H.264 scope
note names for codecs — dischargeable HERE, because zarr v2 is just JSON
metadata + optionally-zlib'd C-order chunks). This script emits an
AnnData-layout store from python stdlib (json/zlib/struct) + numpy ONLY —
no `zarr` package, no JVM code touches the bytes — following the public
zarr v2 spec (https://zarr-specs.readthedocs.io/en/latest/v2/v2.0.html)
and the AnnData on-disk spec (categorical codes/categories sub-group,
csr_matrix data/indices/indptr + encoding-type attrs).

Data is a FIXED FORMULA so the DuckDB oracle can recompute it without
reading the store:   X[i,j] = (i*31 + j*17) % 97   over 48 cells x 20
genes; the CSR variant keeps entries with (i+j) % 3 == 0; obs/label is
categorical alpha/beta/gamma/delta by i%4 with i%13==5 missing (-1);
obs/weight = (i%7) + 0.5; var/col_id = j. All integer-valued-in-double
sums, so Spark-vs-DuckDB equality is exact.

Layout choices deliberately exercise the reader's edge paths: chunk
grids that do NOT divide the shape (7x6 chunks over 48x20 -> partial
edge chunks both axes), zlib AND null compressors, <i4 and <i8 and |S5
dtypes, and consolidated .zmetadata assembled by THIS script.

Usage: python3 tools/make_foreign_zarr.py <outDir>
Deterministic: byte-identical output for a given (script, numpy) pair
except for zlib library variation, which the reader must not care about.
"""
import json, os, sys, zlib
import numpy as np

R, C = 48, 20
CATS = ["alpha", "beta", "gamma", "delta"]


def write(path, data):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(data)


def jmeta(shape, chunks, dtype, compressor, fill):
    return json.dumps({
        "zarr_format": 2, "shape": shape, "chunks": chunks, "dtype": dtype,
        "compressor": ({"id": "zlib", "level": 5} if compressor else None),
        "fill_value": fill, "order": "C", "filters": None,
    }).encode()


def chunks1d(arr, chunk):
    for b in range((len(arr) + chunk - 1) // chunk):
        part = arr[b * chunk:(b + 1) * chunk]
        if len(part) < chunk:  # zarr pads edge chunks to full chunk shape
            pad = np.zeros(chunk, dtype=arr.dtype)
            pad[:len(part)] = part
            part = pad
        yield str(b), part.tobytes()


def write1d(root, name, arr, dtype, chunk, compress):
    meta = {}
    meta[f"{name}/.zarray"] = jmeta([len(arr)], [chunk], dtype,
                                    compress, "" if dtype.startswith("|S") else 0)
    write(os.path.join(root, name, ".zarray"), meta[f"{name}/.zarray"])
    for key, raw in chunks1d(arr, chunk):
        write(os.path.join(root, name, key),
              zlib.compress(raw, 5) if compress else raw)
    return meta


def write2d(root, name, mat, cr, cc, compress):
    meta = {f"{name}/.zarray": jmeta(list(mat.shape), [cr, cc], "<f8",
                                     compress, 0)}
    write(os.path.join(root, name, ".zarray"), meta[f"{name}/.zarray"])
    for bi in range((mat.shape[0] + cr - 1) // cr):
        for bj in range((mat.shape[1] + cc - 1) // cc):
            block = np.zeros((cr, cc), dtype="<f8")  # edge chunks padded
            part = mat[bi * cr:(bi + 1) * cr, bj * cc:(bj + 1) * cc]
            block[:part.shape[0], :part.shape[1]] = part
            raw = block.tobytes()  # C order
            write(os.path.join(root, name, f"{bi}.{bj}"),
                  zlib.compress(raw, 5) if compress else raw)
    return meta


def consolidate(root, meta):
    top = {"zarr_consolidated_format": 1,
           "metadata": {k: json.loads(v) for k, v in sorted(meta.items())}}
    write(os.path.join(root, ".zmetadata"),
          json.dumps(top, sort_keys=True).encode())


def group_marker(root, meta, prefix=""):
    key = (prefix + "/.zgroup").lstrip("/") if prefix else ".zgroup"
    meta[key] = json.dumps({"zarr_format": 2}).encode()
    write(os.path.join(root, prefix, ".zgroup"), meta[key])


def main(out):
    i = np.arange(R)[:, None]
    j = np.arange(C)[None, :]
    x = ((i * 31 + j * 17) % 97).astype("<f8")

    # ---- dense.zarr: dense X + categorical obs + numeric obs + var ----
    d = os.path.join(out, "dense.zarr")
    meta = {}
    group_marker(d, meta)
    group_marker(d, meta, "obs")
    group_marker(d, meta, "obs/label")
    group_marker(d, meta, "var")
    meta.update(write2d(d, "X", x, cr=7, cc=6, compress=True))
    codes = np.where(np.arange(R) % 13 == 5, -1, np.arange(R) % 4).astype("<i4")
    meta.update(write1d(d, "obs/label/codes", codes, "<i4", 7, compress=True))
    cats_raw = b"".join(c.encode().ljust(5, b"\x00") for c in CATS)
    meta.update(write1d(d, "obs/label/categories",
                        np.frombuffer(cats_raw, dtype="|S5"),
                        "|S5", 4, compress=False))
    meta["obs/label/.zattrs"] = json.dumps(
        {"encoding-type": "categorical", "encoding-version": "0.2.0",
         "ordered": False}).encode()
    write(os.path.join(d, "obs/label/.zattrs"), meta["obs/label/.zattrs"])
    weight = (np.arange(R) % 7 + 0.5).astype("<f8")
    meta.update(write1d(d, "obs/weight", weight, "<f8", 10, compress=False))
    meta.update(write1d(d, "var/col_id", np.arange(C).astype("<i8"),
                        "<i8", 8, compress=True))
    consolidate(d, meta)

    # ---- sparse.zarr: the SAME matrix as an AnnData csr_matrix X ----
    sp = os.path.join(out, "sparse.zarr")
    meta = {}
    group_marker(sp, meta)
    group_marker(sp, meta, "X")
    keep = ((i + j) % 3 == 0)
    data, indices, indptr = [], [], [0]
    for r in range(R):
        cols = np.where(keep[r])[0]
        data.extend(x[r, cols].tolist())
        indices.extend(cols.tolist())
        indptr.append(len(data))
    meta["X/.zattrs"] = json.dumps(
        {"encoding-type": "csr_matrix", "encoding-version": "0.1.0",
         "shape": [R, C]}).encode()
    write(os.path.join(sp, "X", ".zattrs"), meta["X/.zattrs"])
    meta.update(write1d(sp, "X/data", np.array(data, dtype="<f8"),
                        "<f8", 64, compress=True))
    meta.update(write1d(sp, "X/indices", np.array(indices, dtype="<i4"),
                        "<i4", 64, compress=True))
    meta.update(write1d(sp, "X/indptr", np.array(indptr, dtype="<i8"),
                        "<i8", 16, compress=False))
    consolidate(sp, meta)
    print(f"[foreign-zarr] wrote {d} and {sp} "
          f"(R={R} C={C}, nnz={len(data)})")


if __name__ == "__main__":
    main(sys.argv[1])
