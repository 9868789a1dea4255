// Native dedup-plan builder: the host input pipeline's hot path.
//
// Replicates sparkfm_tpu/ops/embedding.py::host_dedup exactly (the numpy
// implementation is the semantics reference; tests/test_native_io.py pins
// element equality): stable sort of the flat batch ids, run boundaries ->
// dense ranks (clipped to the unique budget), unique-id table padded with
// the fill id, plus the id-sorted values and example indices the hybrid
// sorted-backward step consumes.
//
// Why native: numpy's argsort + five fancy-index passes cost ~68 ms for a
// 16384x39 Criteo batch on this host — 3x the ~21 ms device step, i.e. the
// input pipeline throttles the chip even through the prefetcher. This
// implementation uses a 3x11-bit LSD radix sort (stable by construction,
// matching numpy's kind="stable") and fuses every derived array into the
// two passes over the sorted slots.
//
// The reference has no analog (its ETL ships driver-built indexer maps in
// Spark closures, StandardVectorizor.scala:26-48); this is runtime support
// for the TPU step's fixed-budget unique-row contract.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kRadixBits = 11;
constexpr int kBuckets = 1 << kRadixBits;   // 2048
constexpr uint32_t kMask = kBuckets - 1;

// One stable counting pass over `shift` bits: src -> dst (ids), osrc ->
// odst (carried permutation).
void radix_pass(const uint32_t* src, uint32_t* dst,
                const int32_t* osrc, int32_t* odst,
                int64_t n, int shift) {
  int64_t hist[kBuckets];
  std::memset(hist, 0, sizeof(hist));
  for (int64_t i = 0; i < n; ++i) hist[(src[i] >> shift) & kMask]++;
  int64_t run = 0;
  for (int b = 0; b < kBuckets; ++b) {
    int64_t c = hist[b];
    hist[b] = run;
    run += c;
  }
  for (int64_t i = 0; i < n; ++i) {
    int64_t pos = hist[(src[i] >> shift) & kMask]++;
    dst[pos] = src[i];
    odst[pos] = osrc[i];
  }
}

}  // namespace

extern "C" {

// All output buffers are caller-allocated:
//   order (n), ranks (n), seg (n), uids (budget),
//   svals (n, may be null with vals null), sex (n, same), out2 = {count,
//   overflow}.
// Returns 0 on success.
int dp_build(const int32_t* ids, const float* vals, int64_t n,
             int32_t last_dim, int32_t budget, int32_t fill,
             int32_t* order, int32_t* ranks, int32_t* seg, int32_t* uids,
             float* svals, int32_t* sex, int32_t* out2) {
  if (n <= 0 || budget <= 0 || last_dim <= 0) return 1;

  std::vector<uint32_t> keys_a(n), keys_b(n);
  std::vector<int32_t> ord_b(n);
  uint32_t maxid = 0;
  for (int64_t i = 0; i < n; ++i) {
    uint32_t k = static_cast<uint32_t>(ids[i]);
    keys_a[i] = k;
    if (k > maxid) maxid = k;
    order[i] = static_cast<int32_t>(i);
  }
  // Only as many stable 11-bit passes as the id range needs: hashed
  // 2^22-bucket Criteo ids take 2 passes, not 3.
  int passes = 1;
  while (passes < 3 && (maxid >> (passes * kRadixBits)) != 0) ++passes;
  uint32_t* ka = keys_a.data();
  uint32_t* kb = keys_b.data();
  int32_t* oa = order;
  int32_t* ob = ord_b.data();
  for (int p = 0; p < passes; ++p) {
    radix_pass(ka, kb, oa, ob, n, p * kRadixBits);
    std::swap(ka, kb);
    std::swap(oa, ob);
  }
  // sorted ids in ka, permutation in oa
  const uint32_t* sid = ka;
  if (oa != order) std::memcpy(order, oa, n * sizeof(int32_t));

  // one pass: boundaries -> seg (clipped), uids, count; plus svals/sex
  int64_t count = 0;
  const int32_t bcap = budget;
  for (int64_t i = 0; i < n; ++i) {
    if (i == 0 || sid[i] != sid[i - 1]) {
      if (count < bcap) uids[count] = static_cast<int32_t>(sid[i]);
      ++count;
    }
    int64_t s = count - 1;
    seg[i] = static_cast<int32_t>(s < bcap ? s : bcap - 1);
  }
  for (int64_t u = count < bcap ? count : bcap; u < bcap; ++u)
    uids[u] = fill;
  // ranks[order[i]] = seg[i]
  for (int64_t i = 0; i < n; ++i) ranks[order[i]] = seg[i];
  if (vals != nullptr && svals != nullptr && sex != nullptr) {
    for (int64_t i = 0; i < n; ++i) {
      int32_t o = order[i];
      svals[i] = vals[o];
      sex[i] = o / last_dim;
    }
  }
  out2[0] = static_cast<int32_t>(count);
  out2[1] = count > bcap ? 1 : 0;
  return 0;
}

}  // extern "C"
