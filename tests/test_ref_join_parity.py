"""JOIN-OUTPUT parity against the reference's own join code.

Round 2 closed generator parity (test_ref_binary_parity.py); this module
closes the remaining loop: the JOIN RESULTS themselves, compared row-for-
row (as multisets) against the reference's own implementations running on
this host:

1. **The checked-in `cpra` binary** (built by the original authors with
   icpc; SSE2 baseline + explicit AVX-512F intrinsics, which this host
   executes natively).  It fails to load only on libmemkind.so.0, so a
   20-line hbw_*->malloc shim library makes it runnable.  Its join
   output is extracted with an LD_PRELOAD that (a) redirects its
   hardcoded data paths to our generated relation files, (b) zero-fills
   posix_memalign allocations so uninitialized slop reads as null keys
   (key 0 is never generated), and (c) dumps the large allocations at
   exit -- the join triple (join_keys, join_inner_vals, join_outer_vals)
   is identified by the reference's own allocation order/size and
   verified as an exact row multiset against the numpy golden join AND
   this repo's engine.

2. **npj.cpp compiled here** (the checked-in `npj` binary refuses to run:
   icpc's CPU dispatcher demands AVX512ER/PF, which only KNL has).  The
   full VECTORIZED probe path compiles under g++ with a small header of
   KNL->AVX512F intrinsic mappings plus the documented npj.cpp:1031-1039
   bit-rot fixups; its live per-thread cardinality assert
   (npj.cpp:1098) runs, and close_gaps' compacted output is captured at
   the `free(join_keys)` calls (npj.cpp:1115-1117) by the same preload.

Reference-behavior note, verified here: the cpra pipeline has NO
close_gaps (cpra2.cpp leaves it out of run_hj) and its per-thread output
buffers drop a small tail at thread boundaries when T > 1 (measured:
~60-90 rows/thread at 1M rows); T=1 is its exact-output contract, same
as the generator's T=1 bit-reproducibility contract.
"""

from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np
import pytest

from hash_join_codes_knl_tpu.engine.oracle import join_oracle, multiset_digest

REF_DIR = "/root/reference"
CPRA_BIN = os.path.join(REF_DIR, "cpra")

MEMKIND_SHIM = """\
#include <stdlib.h>
void *hbw_malloc(size_t n){ return malloc(n); }
void hbw_free(void *p){ free(p); }
void *hbw_realloc(void *p, size_t n){ return realloc(p, n); }
void *hbw_calloc(size_t n, size_t s){ return calloc(n, s); }
int hbw_check_available(void){ return 0; }
"""

DUMP_SHIM = r"""
#define _GNU_SOURCE
#include <stdio.h>
#include <string.h>
#include <stdlib.h>
#include <dlfcn.h>
#include <pthread.h>

#define MAXA 8192
static struct { void *ptr; size_t size; int freed_order; } g_allocs[MAXA];
static int g_n = 0;
static int g_nfreed = 0;
static pthread_mutex_t g_mu = PTHREAD_MUTEX_INITIALIZER;

static const char *redir_for(const char *path) {
    const char *base = strrchr(path, '/');
    base = base ? base + 1 : path;
    if (!strncmp(base, "ik_", 3) || strstr(path, "inner_keys")) return getenv("REF_IK");
    if (!strncmp(base, "iv_", 3) || strstr(path, "inner_vals")) return getenv("REF_IV");
    if (!strncmp(base, "ok_", 3) || strstr(path, "outer_keys")) return getenv("REF_OK");
    if (!strncmp(base, "ov_", 3) || strstr(path, "outer_vals")) return getenv("REF_OV");
    return NULL;
}
FILE *fopen(const char *path, const char *mode) {
    static FILE *(*real)(const char*, const char*);
    if (!real) real = dlsym(RTLD_NEXT, "fopen");
    const char *r = redir_for(path);
    if (r && *r) path = r;
    return real(path, mode);
}
FILE *fopen64(const char *path, const char *mode) {
    static FILE *(*real)(const char*, const char*);
    if (!real) real = dlsym(RTLD_NEXT, "fopen64");
    const char *r = redir_for(path);
    if (r && *r) path = r;
    return real(path, mode);
}
int pthread_attr_setaffinity_np(pthread_attr_t *a, size_t c, const cpu_set_t *s)
{ (void)a; (void)c; (void)s; return 0; }

int posix_memalign(void **out, size_t align, size_t size) {
    static int (*real)(void**, size_t, size_t);
    if (!real) real = dlsym(RTLD_NEXT, "posix_memalign");
    int rc = real(out, align, size);
    if (rc == 0 && *out) {
        memset(*out, 0, size);  /* uninitialized slop reads as null keys */
        pthread_mutex_lock(&g_mu);
        if (g_n < MAXA) { g_allocs[g_n].ptr = *out; g_allocs[g_n].size = size;
                          g_allocs[g_n].freed_order = -1; g_n++; }
        pthread_mutex_unlock(&g_mu);
    }
    return rc;
}

static size_t dump_min(void) {
    const char *m = getenv("HJK_DUMP_MIN");
    return m ? (size_t)atoll(m) : 0;
}
static void dump_one(const char *tag, int idx, void *ptr, size_t size) {
    const char *dir = getenv("HJK_DUMP_DIR");
    if (!dir || size < dump_min()) return;
    char path[1024];
    static FILE *(*real)(const char*, const char*);
    if (!real) real = dlsym(RTLD_NEXT, "fopen");
    snprintf(path, sizeof path, "%s/%s_%03d.bin", dir, tag, idx);
    FILE *f = real(path, "wb");
    if (f) { fwrite(ptr, 1, size, f); fclose(f); }
}

void free(void *ptr) {
    static void (*real)(void*);
    if (!real) real = dlsym(RTLD_NEXT, "free");
    if (ptr) {
        /* dump OUTSIDE the lock: dump_one's fclose frees stdio buffers,
           which re-enters this interposer */
        int dump_idx = -1; size_t size = 0;
        pthread_mutex_lock(&g_mu);
        for (int i = 0; i < g_n; i++) {
            if (g_allocs[i].ptr == ptr && g_allocs[i].freed_order < 0) {
                g_allocs[i].freed_order = g_nfreed;
                if (g_nfreed < 16) { dump_idx = g_nfreed; size = g_allocs[i].size; }
                g_nfreed++;
                break;
            }
        }
        pthread_mutex_unlock(&g_mu);
        if (dump_idx >= 0) dump_one("freed", dump_idx, ptr, size);
    }
    real(ptr);
}

__attribute__((destructor)) static void dump_all(void) {
    const char *dir = getenv("HJK_DUMP_DIR");
    if (!dir) return;
    char path[1024];
    static FILE *(*real)(const char*, const char*);
    if (!real) real = dlsym(RTLD_NEXT, "fopen");
    snprintf(path, sizeof path, "%s/allocs.txt", dir);
    FILE *idx = real(path, "w");
    for (int i = 0; i < g_n; i++) {
        if (idx) fprintf(idx, "%d %zu %d\n", i, g_allocs[i].size,
                         g_allocs[i].freed_order);
        if (g_allocs[i].freed_order < 0)
            dump_one("alloc", i, g_allocs[i].ptr, g_allocs[i].size);
    }
    if (idx) fclose(idx);
}
"""

# KNL/IMCI-era intrinsics -> AVX-512F equivalents for compiling npj.cpp's
# vectorized path under g++ on this host.  Semantics verified end-to-end
# by the oracle comparison below (a wrong mapping cannot pass).
KNL_SHIMS = """\
#pragma once
#include <immintrin.h>
#ifndef _mm512_int2mask
#define _mm512_int2mask(x) ((__mmask16)(x))
#endif
#define _mm512_permutevar_epi32(idx, a) _mm512_permutexvar_epi32((idx), (a))
static inline void hjk_stream(void *p, __m512 v){ _mm512_storeu_si512(p, _mm512_castps_si512(v)); }
static inline void hjk_stream(void *p, __m512i v){ _mm512_storeu_si512(p, v); }
#define _mm512_stream_ps(p, v) hjk_stream((void*)(p), (v))
#define _mm512_stream_si512(p, v) hjk_stream((void*)(p), (v))
#define _mm_countbits_64(x) ((size_t)__builtin_popcountll(x))
#define _mm512_kconcatlo_64(a, b) \\
    (((unsigned long long)(unsigned short)(a) << 16) | (unsigned short)(b))
#define _mm512_mask_i32logather_epi64(src, k, idx, base, scale) \\
    _mm512_mask_i32gather_epi64((src), (__mmask8)(k), \\
                                _mm512_castsi512_si256(idx), (base), (scale))
#define _mm512_permute4f128_epi32(x, p) _mm512_shuffle_i32x4((x), (x), (p))
#define _MM_SWIZ_REG_CDAB 0xB1
#define _mm512_swizzle_epi32(x, p) _mm512_shuffle_epi32((x), (_MM_PERM_ENUM)(p))
"""

# npj.cpp:1031-1039 bit rot: f_inner_keys / *_1 names are never declared
# in the committed file (its buffers are inner_keys etc., npj.cpp:982)
NPJ_FIXUPS = """\
#pragma once
#include <cstdio>
static FILE *f_inner_keys, *f_inner_vals, *f_outer_keys, *f_outer_vals;
#define inner_keys_1 inner_keys
#define inner_vals_1 inner_vals
#define outer_keys_1 outer_keys
#define outer_vals_1 outer_vals
"""

NUMA_STUB = "#pragma once\nstatic inline int numa_available(void){return -1;}\n"
HBW_STUB = (
    "#pragma once\n#include <stdlib.h>\n"
    "static inline void* hbw_malloc(size_t s){return malloc(s);}\n"
    "static inline void hbw_free(void* p){free(p);}\n"
    "static inline void* hbw_realloc(void* p, size_t s){return realloc(p,s);}\n"
)

# NOTE on build-side multiplicity (write.cpp:1526-1538): inner keys are
# the distinct slice (inner_distinct = min(inner, outer)) followed by
# uniform REPEATS, so any inner > outer workload has duplicate build
# keys.  "outer_small" is therefore already M:N (max multiplicity ~9 at
# seed 7); "dup_build" pins the heavy-duplication contract explicitly
# (3x mean multiplicity) and test_cpra_binary_join_matches_engine
# asserts the workload is genuinely multi-match before trusting the
# comparison.
WORKLOADS = {
    "even": dict(inner=500_000, outer=500_000, selc=1.0),
    "outer_small": dict(inner=500_000, outer=250_000, selc=1.0),
    "half_selc": dict(inner=500_000, outer=500_000, selc=0.5),
    "dup_build": dict(inner=600_000, outer=200_000, selc=1.0),
}
# workloads whose BUILD side carries duplicate keys (M:N output):
# the parity test must prove the multiplicity is really there
MN_WORKLOADS = {"outer_small", "dup_build"}


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    if not os.path.exists(CPRA_BIN) or shutil.which("g++") is None:
        pytest.skip("reference binaries or toolchain unavailable")
    d = tmp_path_factory.mktemp("refjoin")
    (d / "memkind_shim.c").write_text(MEMKIND_SHIM)
    (d / "dump_shim.c").write_text(DUMP_SHIM)
    (d / "knl_shims.h").write_text(KNL_SHIMS)
    (d / "npj_fixups.h").write_text(NPJ_FIXUPS)
    (d / "numa.h").write_text(NUMA_STUB)
    (d / "hbwmalloc.h").write_text(HBW_STUB)
    subprocess.run(
        ["gcc", "-shared", "-fPIC", "-O2", "-Wl,-soname,libmemkind.so.0",
         "memkind_shim.c", "-o", "libmemkind.so.0"], cwd=d, check=True)
    subprocess.run(
        ["gcc", "-shared", "-fPIC", "-O2", "dump_shim.c", "-o",
         "dump_shim.so", "-ldl", "-lpthread"], cwd=d, check=True)
    # compile npj.cpp's vectorized path (-O0: same fall-off-the-end UB
    # treatment as the write.cpp parity build)
    r = subprocess.run(
        ["g++", "-O0", "-march=native", "-DSCATTER", f"-I{d}",
         "-include", "knl_shims.h", "-include", "npj_fixups.h",
         os.path.join(REF_DIR, "npj.cpp"), "-lpthread", "-lrt",
         "-std=c++14", "-o", "npj_ref"],
        cwd=d, capture_output=True, text=True)
    npj_ok = r.returncode == 0

    from hash_join_codes_knl_tpu.relgen.generate import generate

    data = {}
    for name, w in WORKLOADS.items():
        inner, outer, _ = generate(
            seed=7, inner_tuples=w["inner"], outer_tuples=w["outer"],
            selc=w["selc"], mode="ref",
        )
        wd = d / name
        wd.mkdir()
        for tag, arr, n in (("ik", inner.keys, w["inner"]),
                            ("iv", inner.vals, w["inner"]),
                            ("ok", outer.keys, w["outer"]),
                            ("ov", outer.vals, w["outer"])):
            arr.astype("<u4").tofile(wd / f"{tag}_{n}.txt")
        data[name] = (inner, outer, wd)
    return d, data, npj_ok


def _run_with_dumps(d, wd, w, binary, args, extra_env=None):
    dumps = wd / f"dumps_{os.path.basename(binary)}_{args[0]}"
    dumps.mkdir(exist_ok=True)
    env = dict(
        os.environ,
        LD_PRELOAD=str(d / "dump_shim.so"),
        LD_LIBRARY_PATH=str(d),
        HJK_DUMP_DIR=str(dumps),
        HJK_DUMP_MIN=str(1 << 20),
        REF_IK=str(wd / f"ik_{w['inner']}.txt"),
        REF_IV=str(wd / f"iv_{w['inner']}.txt"),
        REF_OK=str(wd / f"ok_{w['outer']}.txt"),
        REF_OV=str(wd / f"ov_{w['outer']}.txt"),
        **(extra_env or {}),
    )
    # no `timeout` wrapper: it would inherit LD_PRELOAD and its own exit
    # destructor would truncate allocs.txt
    subprocess.run([binary, *args], cwd=wd, env=env, check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                   timeout=600)
    return dumps


def _u32(path):
    return np.fromfile(path, dtype=np.uint32)


def _cpra_join_triple(dumps, n_inner, n_outer):
    """Identify (join_keys, join_inner_vals, join_outer_vals) among the
    dumped allocations by the reference's own allocation order
    (cpra2.cpp:2073-2087): 4 inner-sized buffers, 4 outer-sized buffers,
    then the 3 equal-size join buffers."""
    entries = []
    for line in (dumps / "allocs.txt").read_text().splitlines():
        i, size, freed = line.split()
        entries.append((int(i), int(size), int(freed)))
    want_prefix = [4 * n_inner] * 4 + [4 * n_outer] * 4
    for a in range(len(entries) - 10):
        if [e[1] for e in entries[a : a + 8]] == want_prefix:
            join_sizes = {entries[a + 8 + k][1] for k in range(3)}
            assert len(join_sizes) == 1, "join triple sizes differ"
            idxs = [entries[a + 8 + k][0] for k in range(3)]
            return tuple(_u32(dumps / f"alloc_{i:03d}.bin") for i in idxs)
    raise AssertionError("relation-buffer prefix not found in allocs.txt")


def _engine_digest(inner, outer):
    from hash_join_codes_knl_tpu.engine.phj import (
        join,
        materialize,
        materialize_expanded,
    )

    res, _ = join(inner.keys, inner.vals, outer.keys, outer.vals)
    if np.asarray(res.match_cnts).max(initial=0) > 1:
        return multiset_digest(
            *materialize_expanded(res, inner.keys, inner.vals)
        )
    return multiset_digest(*materialize(res))


@pytest.mark.parametrize("name", list(WORKLOADS))
def test_cpra_binary_join_matches_engine(harness, name):
    """The checked-in cpra binary's full join output (key, outer val,
    inner val rows) must equal the oracle AND this repo's engine as a
    multiset -- T=1, the reference's exact-output contract.  M:N
    workloads (duplicate build keys, write.cpp:1526-1538 inner repeats)
    are asserted genuinely multi-match so the expanded-output parity
    cannot silently degrade to 1:1."""
    d, data, _ = harness
    inner, outer, wd = data[name]
    w = WORKLOADS[name]
    if name in MN_WORKLOADS:
        _, mult = np.unique(inner.keys, return_counts=True)
        assert mult.max() > 1, "workload must have duplicate build keys"
    dumps = _run_with_dumps(d, wd, w, CPRA_BIN,
                            ["1", str(w["outer"]), str(w["inner"])])
    want = join_oracle(inner.keys, inner.vals, outer.keys, outer.vals)
    jk, jiv, jov = _cpra_join_triple(dumps, w["inner"], w["outer"])
    m = jk != 0
    assert int(m.sum()) == len(want[0]), "cardinality mismatch"
    got = multiset_digest(jk[m], jov[m], jiv[m])
    assert got == multiset_digest(*want), "binary vs oracle row multiset"
    assert got == _engine_digest(inner, outer), "binary vs engine"


def test_cpra_binary_thread_tail_drop_documented(harness):
    """Reference behavior at T>1 (no close_gaps in cpra's run_hj): a
    small per-thread buffer tail is dropped.  Pin the contract: output
    is a SUBSET of the oracle rows, missing at most threads*256 (the
    probe buffer size, cpra2.cpp BUFFER_SIZE)."""
    d, data, _ = harness
    name = "even"
    inner, outer, wd = data[name]
    w = WORKLOADS[name]
    dumps = _run_with_dumps(d, wd, w, CPRA_BIN,
                            ["2", str(w["outer"]), str(w["inner"])])
    want = join_oracle(inner.keys, inner.vals, outer.keys, outer.vals)
    jk, jiv, jov = _cpra_join_triple(dumps, w["inner"], w["outer"])
    m = jk != 0
    n_got = int(m.sum())
    assert len(want[0]) - 2 * 256 <= n_got <= len(want[0])
    # subset check on the key column: per-key counts never exceed oracle
    got_k, got_c = np.unique(jk[m], return_counts=True)
    want_k, want_c = np.unique(want[0], return_counts=True)
    pos = np.searchsorted(want_k, got_k)
    assert (pos < len(want_k)).all() and (want_k[pos] == got_k).all()
    assert (got_c <= want_c[pos]).all()


@pytest.mark.parametrize("name", ["even", "outer_small"])
def test_npj_compiled_join_matches_engine(harness, name):
    """npj.cpp's vectorized join, compiled here, with its live analytic
    cardinality assert (npj.cpp:1098): the run aborts on any per-thread
    cardinality mismatch, and the close_gaps-compacted output captured
    at free(join_keys) must equal oracle and engine multisets.
    (selc<1 workloads are excluded: npj's analytic formula,
    npj.cpp:937-942, has no selectivity term, so its assert only holds
    at selc=1.)"""
    d, data, npj_ok = harness
    if not npj_ok:
        pytest.skip("npj.cpp does not compile on this host")
    inner, outer, wd = data[name]
    w = WORKLOADS[name]
    dumps = _run_with_dumps(d, wd, w, str(d / "npj_ref"),
                            ["1", str(w["outer"]), str(w["inner"]), "1.0"])
    want = join_oracle(inner.keys, inner.vals, outer.keys, outer.vals)
    N = len(want[0])
    # free order at npj.cpp:1115-1117: join_keys, join_inner_vals,
    # join_outer_vals
    jk = _u32(dumps / "freed_000.bin")
    jiv = _u32(dumps / "freed_001.bin")
    jov = _u32(dumps / "freed_002.bin")
    assert (jk[N:] == 0).all(), "output not compact beyond join_tuples"
    got = multiset_digest(jk[:N], jov[:N], jiv[:N])
    assert got == multiset_digest(*want), "binary vs oracle row multiset"
    assert got == _engine_digest(inner, outer), "binary vs engine"
