// Shared stdio helpers for the raw-f32 pipe binaries (upmix_cli,
// upmix_net_client): both speak interleaved float32 stereo over
// FILE* streams and need exact-length reads.
#pragma once

#include <cstdio>

namespace upmix_pipe {

inline size_t read_exact(FILE* f, unsigned char* buf, size_t n) {
  size_t got = 0;
  while (got < n) {
    size_t r = std::fread(buf + got, 1, n - got, f);
    if (r == 0) break;
    got += r;
  }
  return got;
}

}  // namespace upmix_pipe
