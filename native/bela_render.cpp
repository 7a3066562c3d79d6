// bela_render — audio-callback glue binding the native upmix engine to a
// Bela-style real-time host (reference: bela/upmix.cpp:516-553, the
// setup/render/cleanup entry points).
//
// This file is the L4 adapter only: all DSP lives in upmix_host.cpp
// (engine created via the C API).  It is NOT built by the default Makefile
// target because Bela.h and its runtime exist only on the device; build it
// on a Bela board with:
//
//   make -C native bela   # requires the Bela SDK in the include path
//
// Design notes vs the reference glue:
//   - The reference constructs a MultiBandUpmix global and feeds it raw
//     channel pointers per render call.  Here the engine is a heap handle
//     from upmix_create(), so one binary supports any band-edge/window
//     configuration without recompiling.
//   - Output is the reference's Bela downmix: out = side + 0.5 * center
//     per channel (upmix.cpp:289-304), which is exactly
//     upmix_process_block + the stereo_sum mix below.
//   - The engine's warmup contract matches the reference: the first
//     3 hardware callbacks emit silence while history fills; the 4th
//     sees K = block/hop = 4 blocks buffered and emits the first hops
//     (upmix.cpp:232-237; upmix_host.cpp kWarmupBlocks).
//
// Off-device verification: `make -C native bela-mock` builds THIS file
// against native/mock_bela/Bela.h and a host driver; tests/test_bela.py
// runs the real entry points block-by-block and holds the output to the
// streaming oracle (>60 dB) and bit-exact to the library stereo_sum path.

#ifdef UPMIX_HAVE_BELA

#include <Bela.h>

#include <cstring>
#include <vector>

// C API from upmix_host.cpp.
extern "C" {
void* upmix_create(double sr, int hw_block, const double* edges, int n_edges,
                   int xover_mode, int synthesis, int rounding,
                   double threshold_multi, double xo_fraction, int window,
                   int n_threads, int precision);
void upmix_destroy(void* h);
int upmix_process_block(void* h, const float* inL, const float* inR,
                        float* outC, float* outLs, float* outRs);
}

namespace {

// Shipped reference configuration (bela/upmix.cpp:525-528; README.md:65):
// band edges 0/500/2000/8000 Hz (Nyquist appended by the engine),
// 2048-sample hardware blocks at the board's sample rate.
constexpr double kEdges[] = {0.0, 500.0, 2000.0, 8000.0};
constexpr int kNumEdges = 4;

void* gEngine = nullptr;
std::vector<float> gInL, gInR, gC, gLs, gRs;

}  // namespace

bool setup(BelaContext* context, void*) {
  const int hw = (int)context->audioFrames;
  // Bela: one core, float32 fast mode — the single-core ARM target is
  // exactly where halving the memory traffic buys real-time headroom
  // (reference bela/upmix.cpp:516-553 fights for this budget in double).
  // Override with -DUPMIX_BELA_PRECISION=0 for the double parity mode.
#ifndef UPMIX_BELA_PRECISION
#define UPMIX_BELA_PRECISION 1
#endif
  gEngine = upmix_create(context->audioSampleRate, hw, kEdges, kNumEdges,
                         /*xover_mode=*/0, /*synthesis=*/1, /*rounding=*/1,
                         /*threshold_multi=*/32.0, /*xo_fraction=*/0.25,
                         /*window=*/0, /*n_threads=*/1,
                         /*precision=*/UPMIX_BELA_PRECISION);
  if (!gEngine) return false;
  gInL.assign(hw, 0.0f);
  gInR.assign(hw, 0.0f);
  gC.assign(hw, 0.0f);
  gLs.assign(hw, 0.0f);
  gRs.assign(hw, 0.0f);
  return true;
}

void render(BelaContext* context, void*) {
  const int hw = (int)context->audioFrames;
  for (int n = 0; n < hw; ++n) {
    gInL[n] = audioRead(context, n, 0);
    gInR[n] = audioRead(context, n, 1);
  }
  upmix_process_block(gEngine, gInL.data(), gInR.data(), gC.data(),
                      gLs.data(), gRs.data());
  for (int n = 0; n < hw; ++n) {
    audioWrite(context, n, 0, gLs[n] + 0.5f * gC[n]);
    audioWrite(context, n, 1, gRs[n] + 0.5f * gC[n]);
  }
}

void cleanup(BelaContext*, void*) {
  upmix_destroy(gEngine);
  gEngine = nullptr;
}

#endif  // UPMIX_HAVE_BELA
