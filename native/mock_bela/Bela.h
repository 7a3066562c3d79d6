// Minimal mock of the Bela audio-callback ABI, sufficient to compile and
// RUN native/bela_render.cpp off-device (reference runtime surface used by
// bela/upmix.cpp:516-553: BelaContext{audioFrames, audioSampleRate},
// audioRead/audioWrite, and the setup/render/cleanup user entry points).
//
// Matches the real SDK's default interleaved layout:
//   audioIn[frame * audioInChannels + channel].
//
// This header lives under native/mock_bela/ and is selected with
// `-Imock_bela` by the `bela-mock` Makefile target; building on a real
// board uses the genuine SDK header instead (`make -C native bela`).
#pragma once

#include <cstdint>

struct BelaContext {
  float* audioIn;    // interleaved [audioFrames][audioInChannels]
  float* audioOut;   // interleaved [audioFrames][audioOutChannels]
  uint32_t audioFrames;
  uint32_t audioInChannels;
  uint32_t audioOutChannels;
  float audioSampleRate;
};

static inline float audioRead(BelaContext* context, int frame, int channel) {
  return context->audioIn[frame * context->audioInChannels + channel];
}

static inline void audioWrite(BelaContext* context, int frame, int channel,
                              float value) {
  context->audioOut[frame * context->audioOutChannels + channel] = value;
}

// User-provided entry points (defined by bela_render.cpp).
bool setup(BelaContext* context, void* userData);
void render(BelaContext* context, void* userData);
void cleanup(BelaContext* context, void* userData);
