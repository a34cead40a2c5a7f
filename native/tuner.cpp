// Native workload auto-tuner for heterogeneous multi-device row-band splits.
//
// C++ implementation of the same load-balancing algorithm as the reference's
// tune:: namespace (/root/reference/src/workload_tuner.hpp:8-105, described in
// SURVEY.md C4), re-designed with an explicit, seedable RNG so the Python
// binding and the pure-Python fallback produce identical decision streams
// (the reference uses global rand(), which is untestable).
//
// Algorithm per tuning round, operating on the most recent frame record:
//   1. relative variance of per-device durations > 1.8  ->  redistribute rows
//      proportionally to measured throughput (rows/duration), remainder rows
//      to the lowest-indexed devices;
//   2. else, with probability 2/3: stochastic hill-climb — take the best
//      distribution seen so far and move one row between two random devices;
//   3. else: converged (keep current distribution).
// History is capped: once more than 10 records accumulate, only the latest
// is retained before appending (same forgetting rule as the reference).
//
// Build: make -C native   (produces build/libraytrace_tuner.so)

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Frame {
    std::vector<uint32_t> dist;
    double duration;                 // whole-frame wall time
    std::vector<double> est;         // per-device busy-time estimates
};

struct Tuner {
    uint32_t total = 0;
    uint32_t devices = 0;
    uint64_t rng = 0x9E3779B97F4A7C15ull;
    std::vector<Frame> frames;
};

// xorshift64* — deterministic, shared with the Python fallback
inline uint64_t next_rng(uint64_t& s) {
    s ^= s >> 12;
    s ^= s << 25;
    s ^= s >> 27;
    return s * 0x2545F4914F6CDD1Dull;
}

inline uint32_t rng_below(uint64_t& s, uint32_t n) {
    return static_cast<uint32_t>(next_rng(s) % n);
}

}  // namespace

extern "C" {

void* tuner_create(uint32_t total_workload, uint32_t device_count, uint64_t seed) {
    auto* t = new Tuner();
    t->total = total_workload;
    t->devices = device_count;
    if (seed) t->rng = seed;
    return t;
}

void tuner_destroy(void* h) { delete static_cast<Tuner*>(h); }

void tuner_add_frame(void* h, const uint32_t* dist, double duration,
                     const double* est_durations) {
    auto* t = static_cast<Tuner*>(h);
    if (t->frames.size() > 10) {
        Frame last = t->frames.back();
        t->frames.clear();
        t->frames.push_back(std::move(last));
    }
    Frame f;
    f.dist.assign(dist, dist + t->devices);
    f.duration = duration;
    f.est.assign(est_durations, est_durations + t->devices);
    t->frames.push_back(std::move(f));
}

// Returns 1 and fills out_dist[device_count] with a new distribution, or 0 if
// converged (keep measuring with the current distribution).
int tuner_get_workload(void* h, uint32_t* out_dist) {
    auto* t = static_cast<Tuner*>(h);
    if (t->frames.empty() || t->devices == 0) return 0;
    const Frame& f = t->frames.back();
    const uint32_t n = t->devices;

    double avg = 0.0;
    for (double e : f.est) avg += e;
    avg /= static_cast<double>(n);
    double variance = 0.0;
    if (avg > 0.0) {
        for (double e : f.est) {
            const double v = (e - avg) / avg;
            variance += v * v;
        }
    }

    if (variance > 1.8) {
        // throughput-proportional redistribution
        std::vector<double> v(n);
        double total_v = 0.0;
        for (uint32_t i = 0; i < n; i++) {
            v[i] = f.est[i] > 0.0 ? static_cast<double>(f.dist[i]) / f.est[i] : 0.0;
            total_v += v[i];
        }
        if (total_v <= 0.0) return 0;
        uint32_t remain = t->total;
        for (uint32_t i = 0; i < n; i++) {
            out_dist[i] = static_cast<uint32_t>(t->total * v[i] / total_v);
            remain -= out_dist[i];
        }
        for (uint32_t i = 0; i < remain; i++) out_dist[i % n]++;
        return 1;
    }

    if (rng_below(t->rng, 3) != 0) {
        // hill-climb from the best frame seen
        const Frame* best = &t->frames.front();
        for (const Frame& fr : t->frames)
            if (fr.duration < best->duration) best = &fr;
        std::memcpy(out_dist, best->dist.data(), n * sizeof(uint32_t));
        const uint32_t dec = rng_below(t->rng, n);
        const uint32_t inc = rng_below(t->rng, n);
        if (out_dist[dec] > 1) {
            out_dist[inc] += 1;
            out_dist[dec] -= 1;
        }
        return 1;
    }

    return 0;  // converged
}

uint32_t tuner_frame_count(void* h) {
    return static_cast<uint32_t>(static_cast<Tuner*>(h)->frames.size());
}

}  // extern "C"
