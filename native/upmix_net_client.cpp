// upmix_net_client — native network front end for the stream server.
//
// Raw interleaved float32 stereo on stdin -> ONE session on an
// upmix-tpu StreamServer (protocol v2; upmix_tpu/serve_stream.py) ->
// raw float32 output on stdout.  The embedded-host shell of the
// serving triangle: a Bela-class device (the reference's whole runtime,
// /root/reference/bela/upmix.cpp:516-553, is a single stream of
// hardware blocks exactly like this) or an ffmpeg pipe streams through
// this binary while the pooled TPU server does the DSP.  No DSP, no
// Python, no JAX in-process — the binary is the wire protocol plus
// stdin/stdout framing, composing exactly like upmix_cli but with the
// math on the server's pool:
//
//   ffmpeg -i in.flac -f f32le -ac 2 - \
//     | ./upmix_net_client --host 10.0.0.5 --port 9977 \
//     | ffmpeg -f f32le -ar 44100 -ac 2 -i - out.wav
//
// The server's output is warmup-aligned per session (output frame i
// corresponds to input frame i and the tail is drained), so
// len(stdout) == len(stdin) in frames and this is a drop-in pipe
// filter.  The final short block is zero-padded on the wire and the
// surplus output frames are trimmed here (stream_client's semantics).
//
// Build: make -C native net
//
// Wire protocol (little-endian; serve_stream.py:12-22):
//   hello:  "UPMX" u32 version(2) u32 mix(0 stereo_sum, 1 lcr)
//           + 16-byte resume token (zeros = new session)
//   reply:  "UPMR" u32 status u32 slot u32 hw u32 out_channels
//           + 16-byte session token + u64 in_frames u64 out_frames
//           + f64 sample_rate
//   then hw*2 float32 per input block, hw*out_channels per output.

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

size_t recv_exact(int fd, unsigned char* buf, size_t n) {
  size_t got = 0;
  while (got < n) {
    ssize_t r = ::recv(fd, buf + got, n - got, 0);
    if (r <= 0) break;
    got += (size_t)r;
  }
  return got;
}

bool send_all(int fd, const unsigned char* buf, size_t n) {
  size_t sent = 0;
  while (sent < n) {
    ssize_t r = ::send(fd, buf + sent, n - sent, MSG_NOSIGNAL);
    if (r <= 0) return false;
    sent += (size_t)r;
  }
  return true;
}

size_t read_exact_stdin(unsigned char* buf, size_t n) {
  size_t got = 0;
  while (got < n) {
    size_t r = std::fread(buf + got, 1, n - got, stdin);
    if (r == 0) break;
    got += r;
  }
  return got;
}

uint32_t le32(const unsigned char* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}

uint64_t le64(const unsigned char* p) {
  return (uint64_t)le32(p) | ((uint64_t)le32(p + 4) << 32);
}

void put32(unsigned char* p, uint32_t v) {
  p[0] = v & 0xff;
  p[1] = (v >> 8) & 0xff;
  p[2] = (v >> 16) & 0xff;
  p[3] = (v >> 24) & 0xff;
}

int usage(const char* argv0) {
  std::fprintf(stderr,
               "usage: %s --port <port> [--host 127.0.0.1]\n"
               "          [--mix stereo_sum|lcr] [--sr <rate>]\n"
               "raw float32 interleaved stereo: stdin -> server -> stdout\n"
               "--sr validates the server's sample rate before sending\n",
               argv0);
  return 2;
}

double parse_num(const char* what, const char* s) {
  char* end = nullptr;
  double v = std::strtod(s, &end);
  if (end == s || *end != '\0') {
    std::fprintf(stderr, "bad numeric value for %s: %s\n", what, s);
    std::exit(2);
  }
  return v;
}

}  // namespace

int main(int argc, char** argv) {
  std::string host = "127.0.0.1";
  std::string port;
  std::string mix = "stereo_sum";
  double expect_sr = 0.0;

  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&](const char* what) -> const char* {
      if (i + 1 >= argc) {
        std::fprintf(stderr, "missing value for %s\n", what);
        std::exit(2);
      }
      return argv[++i];
    };
    if (a == "--host") host = next("--host");
    else if (a == "--port") port = next("--port");
    else if (a == "--mix") mix = next("--mix");
    else if (a == "--sr") expect_sr = parse_num("--sr", next("--sr"));
    else return usage(argv[0]);
  }
  if (port.empty()) return usage(argv[0]);
  uint32_t mix_code;
  if (mix == "stereo_sum") mix_code = 0;
  else if (mix == "lcr") mix_code = 1;
  else return usage(argv[0]);

  // -- connect ---------------------------------------------------------
  struct addrinfo hints;
  std::memset(&hints, 0, sizeof(hints));
  hints.ai_family = AF_UNSPEC;
  hints.ai_socktype = SOCK_STREAM;
  struct addrinfo* res = nullptr;
  int rc = ::getaddrinfo(host.c_str(), port.c_str(), &hints, &res);
  if (rc != 0) {
    std::fprintf(stderr, "resolve %s:%s: %s\n", host.c_str(), port.c_str(),
                 gai_strerror(rc));
    return 1;
  }
  int fd = -1;
  for (struct addrinfo* ai = res; ai; ai = ai->ai_next) {
    fd = ::socket(ai->ai_family, ai->ai_socktype, ai->ai_protocol);
    if (fd < 0) continue;
    if (::connect(fd, ai->ai_addr, ai->ai_addrlen) == 0) break;
    ::close(fd);
    fd = -1;
  }
  ::freeaddrinfo(res);
  if (fd < 0) {
    std::fprintf(stderr, "connect %s:%s failed\n", host.c_str(), port.c_str());
    return 1;
  }

  // -- handshake (protocol v2, fresh session) ---------------------------
  unsigned char hello[12 + 16];
  std::memcpy(hello, "UPMX", 4);
  put32(hello + 4, 2);  // protocol v2
  put32(hello + 8, mix_code);
  std::memset(hello + 12, 0, 16);  // zero token = new session
  if (!send_all(fd, hello, sizeof(hello))) {
    std::fprintf(stderr, "handshake send failed\n");
    return 1;
  }
  unsigned char reply[20 + 16 + 24];
  if (recv_exact(fd, reply, sizeof(reply)) != sizeof(reply) ||
      std::memcmp(reply, "UPMR", 4) != 0) {
    std::fprintf(stderr, "bad server reply\n");
    return 1;
  }
  uint32_t status = le32(reply + 4);
  uint32_t hw = le32(reply + 12);
  uint32_t out_ch = le32(reply + 16);
  double server_sr;
  {
    uint64_t bits = le64(reply + 20 + 16 + 16);
    std::memcpy(&server_sr, &bits, 8);
  }
  if (status == 1) {
    std::fprintf(stderr, "server pool is full\n");
    return 1;
  }
  if (status != 0) {
    std::fprintf(stderr, "server rejected hello (status %u)\n", status);
    return 1;
  }
  if (expect_sr > 0.0 &&
      (server_sr > expect_sr + 1e-6 || server_sr < expect_sr - 1e-6)) {
    std::fprintf(stderr,
                 "server runs at %g Hz but --sr says %g Hz — resample or "
                 "use a matching server\n",
                 server_sr, expect_sr);
    return 1;
  }

  // -- pump: sender thread (stdin -> socket), main (socket -> stdout) ---
  // total_in is published BEFORE the final (padded or empty) block is
  // sent, so the receive side can cap its writes before any pad-derived
  // output frame can possibly arrive.
  std::atomic<long long> total_in{-1};
  std::thread sender([&] {
    std::vector<unsigned char> raw((size_t)hw * 2 * 4);
    long long sum = 0;
    for (;;) {
      size_t got = read_exact_stdin(raw.data(), raw.size());
      size_t frames = got / 8;  // whole stereo f32 frames
      if (frames < hw) {
        total_in.store(sum + (long long)frames);
        if (frames > 0) {
          std::memset(raw.data() + frames * 8, 0, raw.size() - frames * 8);
          send_all(fd, raw.data(), raw.size());
        }
        break;
      }
      if (!send_all(fd, raw.data(), raw.size())) {
        total_in.store(sum);  // server gone; stop cleanly
        break;
      }
      sum += (long long)hw;
    }
    ::shutdown(fd, SHUT_WR);
  });

  const size_t frame_bytes = (size_t)out_ch * 4;
  std::vector<unsigned char> buf(1 << 16);
  std::vector<unsigned char> pending;
  long long emitted = 0;
  bool stdout_open = true;
  for (;;) {
    ssize_t r = ::recv(fd, buf.data(), buf.size(), 0);
    if (r <= 0) break;
    if (!stdout_open) continue;  // drain the socket so the sender finishes
    pending.insert(pending.end(), buf.data(), buf.data() + r);
    long long have = (long long)(pending.size() / frame_bytes);
    long long limit = total_in.load();
    long long n = have;
    if (limit >= 0 && n > limit - emitted) n = limit - emitted;
    if (n > 0) {
      if (std::fwrite(pending.data(), frame_bytes, (size_t)n, stdout) !=
          (size_t)n) {
        stdout_open = false;  // downstream closed (SIGPIPE semantics)
      }
      emitted += n;
      pending.erase(pending.begin(), pending.begin() + n * frame_bytes);
    }
  }
  sender.join();
  ::close(fd);
  std::fflush(stdout);
  long long limit = total_in.load();
  if (stdout_open && limit >= 0 && emitted < limit) {
    std::fprintf(stderr, "short stream: got %lld of %lld frames\n", emitted,
                 limit);
    return 1;
  }
  return 0;
}
