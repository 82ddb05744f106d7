// Native graph builder: batched connected Erdos-Renyi adjacency sampling.
//
// Host-side hot path of the progressive trainer: the reference rebuilds batch_size
// fresh networkx graphs per training batch in interpreted Python
// (gnn_dlasso_progressive.py:181-191 in the reference repo). This builder emits the
// packed dense float32 adjacency batch [B, P, P] the TPU data path consumes, with the
// same connectivity-repair semantics (bridge consecutive components via their smallest
// vertex). Exposed via ctypes (ops/native_graphs.py); no Python in the loop.
// The sampling core lives in sampling.h, shared with the async pipeline
// (pipeline.cc) so both produce identical batches for the same seed.
//
// Build: make -C native   ->  libgraph_builder.so

#include <cstdint>

#include "sampling.h"

extern "C" {

// out: float32 buffer of size batch * P * P (row-major [B, P, P]).
void sample_connected_er_batch(uint64_t seed, int32_t batch, int32_t P, double prob,
                               float* out) {
  dadmm::sample_batch(seed, batch, P, prob, out);
}

}  // extern "C"
