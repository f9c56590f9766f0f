// arrowspace-tpu native host runtime.
//
// The reference engine's host-side machinery is native Rust (rayon thread
// pools, sprs sparse structures — SURVEY.md N15).  The TPU compute path here
// is JAX/XLA, but the host runtime around it is native C++ (this file),
// exposed to Python via ctypes (pyarrowspace_tpu/io/native.py):
//
//   * asx_scan_validate  — fused NaN/Inf ingest scan (the reference binding
//     scans every element on ingest, src/helpers.rs:24-46); OpenMP-parallel.
//   * asx_knn_f64        — exact rectified-cosine eps/k-NN on the host
//     (OpenMP data parallelism across rows = the rayon analogue); used as
//     the CPU validation/golden engine and the small-corpus fast path.
//   * asx_write_blob / asx_read_blob_* — zero-copy binary index segment IO
//     (page-aligned, mmap-readable) backing the fast index format.
//
// Build: make -C native  (or the lazy g++ invocation in io/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------- ingest ---
// Count NaN / Inf in a [n x f] f64 matrix. Returns 0 on success.
int asx_scan_validate(const double* data, int64_t n, int64_t f,
                      int64_t* nan_count, int64_t* inf_count) {
    if (!data || n <= 0 || f <= 0) return -1;
    int64_t nans = 0, infs = 0;
    const int64_t total = n * f;
#pragma omp parallel for reduction(+ : nans, infs) schedule(static)
    for (int64_t i = 0; i < total; ++i) {
        const double v = data[i];
        if (std::isnan(v)) ++nans;
        else if (std::isinf(v)) ++infs;
    }
    *nan_count = nans;
    *inf_count = infs;
    return 0;
}

// ------------------------------------------------------------------ knn ---
// Exact rectified-cosine eps/k-NN over rows of a [n x f] f64 matrix.
// Outputs: out_d [n x k] distances ascending (2.0 pad), out_i [n x k]
// neighbor ids (-1 pad).  OpenMP across rows.
int asx_knn_f64(const double* data, int64_t n, int64_t f, int64_t k,
                double eps, double* out_d, int32_t* out_i) {
    if (!data || n <= 0 || f <= 0 || k <= 0) return -1;
    // Unit-normalize into a scratch copy.
    std::vector<double> unit(static_cast<size_t>(n) * f);
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        const double* row = data + i * f;
        double sq = 0.0;
        for (int64_t j = 0; j < f; ++j) sq += row[j] * row[j];
        const double inv = sq > 0 ? 1.0 / std::sqrt(sq) : 0.0;
        double* dst = unit.data() + i * f;
        for (int64_t j = 0; j < f; ++j) dst[j] = row[j] * inv;
    }
#pragma omp parallel
    {
        std::vector<std::pair<double, int32_t>> heap;  // max-heap by dist
        heap.reserve(k + 1);
#pragma omp for schedule(dynamic, 16)
        for (int64_t i = 0; i < n; ++i) {
            heap.clear();
            const double* xi = unit.data() + i * f;
            for (int64_t j = 0; j < n; ++j) {
                if (j == i) continue;
                const double* xj = unit.data() + j * f;
                double dot = 0.0;
                for (int64_t c = 0; c < f; ++c) dot += xi[c] * xj[c];
                const double d = 1.0 - std::max(0.0, dot);
                if (d > eps) continue;
                if (static_cast<int64_t>(heap.size()) < k) {
                    heap.emplace_back(d, static_cast<int32_t>(j));
                    std::push_heap(heap.begin(), heap.end());
                } else if (d < heap.front().first) {
                    std::pop_heap(heap.begin(), heap.end());
                    heap.back() = {d, static_cast<int32_t>(j)};
                    std::push_heap(heap.begin(), heap.end());
                }
            }
            std::sort_heap(heap.begin(), heap.end());
            for (int64_t s = 0; s < k; ++s) {
                if (s < static_cast<int64_t>(heap.size())) {
                    out_d[i * k + s] = heap[s].first;
                    out_i[i * k + s] = heap[s].second;
                } else {
                    out_d[i * k + s] = 2.0;
                    out_i[i * k + s] = -1;
                }
            }
        }
    }
    return 0;
}

// ----------------------------------------------------------- symmetrize ---
// Union-symmetrize a directed k-NN candidate graph into padded-ELL form
// with the EXACT semantics of pyarrowspace_tpu/ops/symmetrize.py
// (placement order (-w, col); mutual-edge dedup; an edge survives only if
// it ranks within ell_width in BOTH endpoint rows; n_dropped counts the
// ordered entries removed by the cap).  OpenMP across rows — the host
// golden/fallback engine for the device op, and the rayon/sprs analogue
// of the reference's native symmetrization (SURVEY.md N7).
int asx_symmetrize_ell(const int32_t* idx, const double* w, int64_t n,
                       int64_t k, int64_t m, int32_t* out_idx,
                       double* out_w, int64_t* n_dropped) {
    if (!idx || !w || n <= 0 || k <= 0 || m <= 0) return -1;
    struct Cand {
        double w;
        int32_t col;
        int32_t src_row;   // forward edge (src_row, src_slot)
        int32_t src_slot;
        uint8_t is_fwd;
    };
    // Per-row neighbor (col, slot) sorted by col, for mutual lookups.
    std::vector<std::pair<int32_t, int32_t>> nbr(
        static_cast<size_t>(n) * k);
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        auto* row = nbr.data() + i * k;
        for (int64_t s = 0; s < k; ++s)
            row[s] = {idx[i * k + s], static_cast<int32_t>(s)};
        std::sort(row, row + k);
    }
    auto find_slot = [&](int64_t row, int32_t col) -> int32_t {
        const auto* base = nbr.data() + row * k;
        auto it = std::lower_bound(base, base + k,
                                   std::make_pair(col, INT32_MIN));
        if (it != base + k && it->first == col) return it->second;
        return -1;
    };
    // Mutual flags + per-row candidate counts (forward + non-mutual rev).
    std::vector<int32_t> partner(static_cast<size_t>(n) * k, -1);
    std::vector<int64_t> cnt(n + 1, 0);
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        int64_t fwd = 0;
        for (int64_t s = 0; s < k; ++s)
            if (idx[i * k + s] >= 0) ++fwd;
#pragma omp atomic
        cnt[i] += fwd;
    }
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        for (int64_t s = 0; s < k; ++s) {
            const int32_t j = idx[i * k + s];
            if (j < 0) continue;
            const int32_t pslot = find_slot(j, static_cast<int32_t>(i));
            partner[i * k + s] = pslot;
            if (pslot < 0) {        // non-mutual -> reverse copy into row j
#pragma omp atomic
                ++cnt[j];
            }
        }
    }
    std::vector<int64_t> off(n + 1, 0);
    for (int64_t i = 0; i < n; ++i) off[i + 1] = off[i] + cnt[i];
    std::vector<Cand> cand(off[n]);
    std::vector<int64_t> cursor(off.begin(), off.end() - 1);
    // Fill forward entries (per-row serial), then reverse (atomic cursor).
    for (int64_t i = 0; i < n; ++i)
        for (int64_t s = 0; s < k; ++s) {
            const int32_t j = idx[i * k + s];
            if (j < 0) continue;
            cand[cursor[i]++] = {w[i * k + s], j, static_cast<int32_t>(i),
                                 static_cast<int32_t>(s), 1};
        }
    for (int64_t i = 0; i < n; ++i)
        for (int64_t s = 0; s < k; ++s) {
            const int32_t j = idx[i * k + s];
            if (j < 0 || partner[i * k + s] >= 0) continue;
            cand[cursor[j]++] = {w[i * k + s], static_cast<int32_t>(i),
                                 static_cast<int32_t>(i),
                                 static_cast<int32_t>(s), 0};
        }
    // Per-row order (-w, col); fit = rank < m.
    std::vector<uint8_t> fwd_fit(static_cast<size_t>(n) * k, 0);
    std::vector<uint8_t> rev_fit(static_cast<size_t>(n) * k, 0);
#pragma omp parallel for schedule(dynamic, 64)
    for (int64_t r = 0; r < n; ++r) {
        std::sort(cand.data() + off[r], cand.data() + off[r + 1],
                  [](const Cand& a, const Cand& b) {
                      if (a.w != b.w) return a.w > b.w;
                      return a.col < b.col;
                  });
        for (int64_t p = off[r]; p < off[r + 1]; ++p) {
            const Cand& c = cand[p];
            const uint8_t fit = (p - off[r]) < m;
            const size_t e = static_cast<size_t>(c.src_row) * k + c.src_slot;
            if (c.is_fwd) fwd_fit[e] = fit;
            else rev_fit[e] = fit;
        }
    }
    // Survival + outputs.
    int64_t dropped = 0;
#pragma omp parallel for schedule(dynamic, 64) reduction(+ : dropped)
    for (int64_t r = 0; r < n; ++r) {
        int64_t outp = 0;
        for (int64_t p = off[r]; p < off[r + 1]; ++p) {
            const Cand& c = cand[p];
            const size_t e = static_cast<size_t>(c.src_row) * k + c.src_slot;
            uint8_t surv;
            if (c.is_fwd) {
                const int32_t ps = partner[e];
                const uint8_t pfit =
                    ps >= 0 ? fwd_fit[static_cast<size_t>(c.col) * k + ps]
                            : rev_fit[e];
                surv = fwd_fit[e] && pfit;
            } else {
                surv = rev_fit[e] && fwd_fit[e];
            }
            if (surv && outp < m) {
                out_idx[r * m + outp] = c.col;
                out_w[r * m + outp] = c.w;
                ++outp;
            } else if (!surv) {
                ++dropped;
            }
        }
        for (; outp < m; ++outp) {
            out_idx[r * m + outp] = -1;
            out_w[r * m + outp] = 0.0;
        }
    }
    *n_dropped = dropped;
    return 0;
}

// ------------------------------------------------------------------- io ---
// Minimal binary blob segment: magic + payload size, page-aligned payload so
// readers can mmap it zero-copy.
static const uint64_t ASX_MAGIC = 0x0a585341u;  // "ASX\n"
static const uint64_t ASX_ALIGN = 4096;

int asx_write_blob(const char* path, const uint8_t* payload, uint64_t size) {
    FILE* fp = std::fopen(path, "wb");
    if (!fp) return -1;
    uint64_t header[2] = {ASX_MAGIC, size};
    if (std::fwrite(header, sizeof(header), 1, fp) != 1) {
        std::fclose(fp);
        return -2;
    }
    // Pad to the alignment boundary so the payload is page-aligned.
    uint64_t pad = ASX_ALIGN - (sizeof(header) % ASX_ALIGN);
    std::vector<uint8_t> zeros(pad, 0);
    if (std::fwrite(zeros.data(), 1, pad, fp) != pad) {
        std::fclose(fp);
        return -2;
    }
    if (size && std::fwrite(payload, 1, size, fp) != size) {
        std::fclose(fp);
        return -2;
    }
    std::fclose(fp);
    return 0;
}

// Returns payload size, or -1 on failure. Use asx_read_blob to copy out, or
// asx_mmap_blob for a zero-copy view.
int64_t asx_blob_size(const char* path) {
    FILE* fp = std::fopen(path, "rb");
    if (!fp) return -1;
    uint64_t header[2];
    if (std::fread(header, sizeof(header), 1, fp) != 1 ||
        header[0] != ASX_MAGIC) {
        std::fclose(fp);
        return -1;
    }
    std::fclose(fp);
    return static_cast<int64_t>(header[1]);
}

int asx_read_blob(const char* path, uint8_t* out, uint64_t size) {
    FILE* fp = std::fopen(path, "rb");
    if (!fp) return -1;
    if (std::fseek(fp, static_cast<long>(sizeof(uint64_t) * 2 +
                                         (ASX_ALIGN - 16)), SEEK_SET) != 0) {
        std::fclose(fp);
        return -2;
    }
    const size_t got = std::fread(out, 1, size, fp);
    std::fclose(fp);
    return got == size ? 0 : -3;
}

// mmap the payload read-only; returns pointer or null. Caller must
// asx_munmap_blob(ptr, size) when done.
void* asx_mmap_blob(const char* path, uint64_t size) {
    int fd = ::open(path, O_RDONLY);
    if (fd < 0) return nullptr;
    const uint64_t offset = ASX_ALIGN;  // header + pad = one page
    void* ptr = ::mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, offset);
    ::close(fd);
    return ptr == MAP_FAILED ? nullptr : ptr;
}

int asx_munmap_blob(void* ptr, uint64_t size) {
    return ::munmap(ptr, size);
}

}  // extern "C"
