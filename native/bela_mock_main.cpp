// bela_mock — host-side mock Bela runtime that drives the REAL adapter
// entry points (setup/render/cleanup from bela_render.cpp) through
// mock_bela/Bela.h, so the audio-callback glue is executed and verified
// off-device instead of merely syntax-checked.  (The reference's glue,
// bela/upmix.cpp:516-553, only ever runs under the board's runtime.)
//
// Protocol: raw float32 interleaved stereo on stdin -> raw float32
// interleaved stereo on stdout (the Bela downmix out = side + 0.5*center,
// bela/upmix.cpp:289-304).  A trailing partial block is dropped, exactly
// like a real-time device that never sees a fractional hardware block.
//
// Usage: bela_mock [--sr HZ] [--block N]
//
// Build: make -C native bela-mock

#include <cerrno>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "Bela.h"

namespace {

// Strict numeric parsing (garbage exits 2, same policy as upmix_cli).
double parse_double(const char* flag, const char* s) {
  errno = 0;
  char* end = nullptr;
  double v = strtod(s, &end);
  if (errno != 0 || end == s || *end != '\0') {
    fprintf(stderr, "bela_mock: %s expects a number, got '%s'\n", flag, s);
    exit(2);
  }
  return v;
}

long parse_long(const char* flag, const char* s) {
  errno = 0;
  char* end = nullptr;
  long v = strtol(s, &end, 10);
  if (errno != 0 || end == s || *end != '\0') {
    fprintf(stderr, "bela_mock: %s expects an integer, got '%s'\n", flag, s);
    exit(2);
  }
  return v;
}

}  // namespace

int main(int argc, char** argv) {
  double sr = 48000.0;  // Bela defaults (README.md:65)
  long hw = 2048;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    if (a == "--sr" && i + 1 < argc) {
      sr = parse_double("--sr", argv[++i]);
    } else if (a == "--block" && i + 1 < argc) {
      hw = parse_long("--block", argv[++i]);
    } else if (a == "--help" || a == "-h") {
      fprintf(stderr, "usage: bela_mock [--sr HZ] [--block N]\n");
      return 0;
    } else {
      fprintf(stderr, "bela_mock: unknown argument '%s'\n", a.c_str());
      return 2;
    }
  }
  if (sr <= 0 || hw < 4) {
    fprintf(stderr, "bela_mock: invalid --sr/--block\n");
    return 2;
  }

  std::vector<float> in((size_t)hw * 2), out((size_t)hw * 2);
  BelaContext ctx;
  ctx.audioIn = in.data();
  ctx.audioOut = out.data();
  ctx.audioFrames = (uint32_t)hw;
  ctx.audioInChannels = 2;
  ctx.audioOutChannels = 2;
  ctx.audioSampleRate = (float)sr;

  if (!setup(&ctx, nullptr)) {
    fprintf(stderr, "bela_mock: setup() failed (bad config for sr=%g hw=%ld)\n",
            sr, hw);
    return 1;
  }

  const size_t block_floats = (size_t)hw * 2;
  size_t dropped = 0;
  for (;;) {
    size_t got = fread(in.data(), sizeof(float), block_floats, stdin);
    if (got < block_floats) {
      dropped = got;  // fractional tail: a real-time host never renders it
      break;
    }
    render(&ctx, nullptr);
    if (fwrite(out.data(), sizeof(float), block_floats, stdout) !=
        block_floats) {
      fprintf(stderr, "bela_mock: short write\n");
      cleanup(&ctx, nullptr);
      return 1;
    }
  }
  if (dropped)
    fprintf(stderr, "bela_mock: dropped %zu trailing samples (partial block)\n",
            dropped / 2);

  cleanup(&ctx, nullptr);
  return 0;
}
