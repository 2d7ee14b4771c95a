// particle_io — C++ implementation of the frame wire format and transport.
//
// From-scratch native equivalent of the reference's Rust particle_io crate +
// its c_api staticlib (reference: particle_io/src/{particle,reader,writer,
// tcp}.rs and particle_io/c_api/). Behavior contract:
//
// - byte-exact packet layout (signatures 36bce9bd / acc412ec, 96-byte header,
//   20-byte particles, little endian);
// - Reader = background thread pulling packets off the stream into a bounded
//   queue (capacity 2048 frames, reader.rs:17); invalid signatures skip one
//   header-sized chunk with a stderr note instead of dying (reader.rs:34-37);
// - reader_read_last drains the queue and keeps only the newest frame — the
//   simulator's newest-wins consumption (c_api/src/reader.rs:51-63);
// - Writer = plain blocking write_all;
// - TCP client connects to the editor's server and shares one socket between
//   Reader and Writer (tcp.rs:40-47).

#include "particle_io.h"

#include <arpa/inet.h>
#include <netdb.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <condition_variable>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <thread>
#include <string>
#include <vector>

namespace {

constexpr uint8_t kSigStart[4] = {0x36, 0xBC, 0xE9, 0xBD};
constexpr uint8_t kSigEnd[4] = {0xAC, 0xC4, 0x12, 0xEC};
constexpr size_t kQueueCapacity = 2048;  // reference: reader.rs:17

static_assert(sizeof(MiePotentialParams) == 16, "MiePotentialParams layout");
static_assert(sizeof(FrameMetadata) == 80, "FrameMetadata layout");
static_assert(sizeof(FrameHeader) == 96, "FrameHeader layout");
static_assert(sizeof(Particle) == 20, "Particle layout");

// ---------------------------------------------------------------------------
// byte stream abstraction: file descriptor or FILE*, shared by reader/writer
// ---------------------------------------------------------------------------

struct Stream {
  int fd = -1;          // socket or file descriptor
  bool owns_fd = true;  // last holder closes
  std::atomic<int> refs{1};

  // Read exactly n bytes; false on EOF/error.
  bool read_exact(void *buf, size_t n) {
    auto *p = static_cast<uint8_t *>(buf);
    while (n > 0) {
      ssize_t r = ::read(fd, p, n);
      if (r <= 0) return false;
      p += r;
      n -= static_cast<size_t>(r);
    }
    return true;
  }

  bool write_all(const void *buf, size_t n) {
    auto *p = static_cast<const uint8_t *>(buf);
    while (n > 0) {
      ssize_t w = ::write(fd, p, n);
      if (w <= 0) return false;
      p += w;
      n -= static_cast<size_t>(w);
    }
    return true;
  }

  void unref() {
    if (refs.fetch_sub(1) == 1) {
      if (owns_fd && fd >= 0) ::close(fd);
      delete this;
    }
  }
};

// ---------------------------------------------------------------------------
// frame buffer helpers
// ---------------------------------------------------------------------------

Frame alloc_frame(size_t bytes) {
  Frame f;
  f.cap = bytes;
  f.len = bytes;
  f.ptr = static_cast<FrameHeader *>(std::malloc(bytes ? bytes : 1));
  return f;
}

void ensure_capacity(Frame *f, size_t bytes) {
  if (f->cap >= bytes) return;
  size_t grown = f->cap * 2 > bytes ? f->cap * 2 : bytes;
  f->ptr = static_cast<FrameHeader *>(std::realloc(f->ptr, grown));
  f->cap = grown;
}

// ---------------------------------------------------------------------------
// background reader (reference: particle_io/src/reader.rs)
// ---------------------------------------------------------------------------

struct ReaderImpl {
  Stream *stream;
  std::thread thread;
  std::mutex mu;
  std::condition_variable cv_pop;   // queue not full
  std::deque<std::vector<uint8_t>> queue;
  std::atomic<bool> disconnected{false};
  std::atomic<bool> abort{false};

  explicit ReaderImpl(Stream *s) : stream(s) {
    thread = std::thread([this] { run(); });
  }

  ~ReaderImpl() {
    abort.store(true);
    // unblock a reader stuck in ::read by shutting the fd down
    if (stream->fd >= 0) ::shutdown(stream->fd, SHUT_RD);
    cv_pop.notify_all();
    if (thread.joinable()) thread.join();
    stream->unref();
  }

  void run() {
    std::vector<uint8_t> buf;
    while (!abort.load()) {
      FrameHeader header;
      if (!stream->read_exact(&header, sizeof(header))) break;
      if (std::memcmp(header.signature_start, kSigStart, 4) != 0 ||
          std::memcmp(header.signature_end, kSigEnd, 4) != 0) {
        // skip one header-sized chunk; the stream may resync on the next
        // packet boundary (reference: reader.rs:34-37)
        std::fprintf(stderr, "[particle_io] frame signature error, skipping\n");
        continue;
      }
      size_t total = packet_size(header.particle_count);
      buf.resize(total);
      std::memcpy(buf.data(), &header, sizeof(header));
      if (total > sizeof(header) &&
          !stream->read_exact(buf.data() + sizeof(header), total - sizeof(header)))
        break;
      {
        std::unique_lock<std::mutex> lock(mu);
        cv_pop.wait(lock, [this] { return queue.size() < kQueueCapacity || abort.load(); });
        if (abort.load()) break;
        queue.push_back(std::move(buf));
        buf = {};
      }
    }
    disconnected.store(true);
  }

  // pop one frame; spins with 1ms sleeps like read_blocking (reader.rs:76-112)
  bool pop_blocking(std::vector<uint8_t> &out) {
    for (;;) {
      {
        std::lock_guard<std::mutex> lock(mu);
        if (!queue.empty()) {
          out = std::move(queue.front());
          queue.pop_front();
          cv_pop.notify_one();
          return true;
        }
      }
      if (disconnected.load()) return false;
      std::this_thread::sleep_for(std::chrono::milliseconds(1));
    }
  }

  // pop one frame without blocking
  // returns: 0 = nothing pending, 1 = got frame, -1 = disconnected & empty
  int pop_nonblocking(std::vector<uint8_t> &out) {
    std::lock_guard<std::mutex> lock(mu);
    if (queue.empty()) return disconnected.load() ? -1 : 0;
    out = std::move(queue.front());
    queue.pop_front();
    cv_pop.notify_one();
    return 1;
  }

  // drain: keep only the newest pending frame (c_api/src/reader.rs:51-63).
  // `got` = whether a frame was taken; returns the post-drain channel state
  // (false = disconnected) — the reference's drain always runs to the
  // empty/Err case, so its result reflects that state even when a frame was
  // taken on the way.
  bool pop_last(std::vector<uint8_t> &out, bool &got) {
    std::lock_guard<std::mutex> lock(mu);
    got = !queue.empty();
    if (got) {
      out = std::move(queue.back());
      queue.clear();
      cv_pop.notify_one();
    }
    return !disconnected.load();
  }
};

struct WriterImpl {
  Stream *stream;
  explicit WriterImpl(Stream *s) : stream(s) {}
  ~WriterImpl() { stream->unref(); }
};

ReaderImpl *&reader_slot(Reader *r) { return *reinterpret_cast<ReaderImpl **>(r->opaque); }
WriterImpl *&writer_slot(Writer *w) { return *reinterpret_cast<WriterImpl **>(w->opaque); }

void frame_into(std::vector<uint8_t> &bytes, Frame *frame) {
  ensure_capacity(frame, bytes.size());
  std::memcpy(frame->ptr, bytes.data(), bytes.size());
  frame->len = bytes.size();
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

uintptr_t packet_size(uint32_t particle_count) {
  return sizeof(FrameHeader) + sizeof(Particle) * static_cast<size_t>(particle_count);
}

FrameHeader frame_header_init(void) {
  FrameHeader header;
  std::memset(&header, 0, sizeof(header));
  std::memcpy(header.signature_start, kSigStart, 4);
  std::memcpy(header.signature_end, kSigEnd, 4);
  // defaults (reference: particle_io/src/particle.rs:132-165)
  header.metadata.particles[0] = {3.609e-10f, 105.79f * 1.380649e-23f, 14.08f, 6.0f};  // N2
  header.metadata.particles[1] = {3.404e-10f, 117.84f * 1.380649e-23f, 12.085f, 6.0f}; // Ar
  header.metadata.cursor_pos[0] = -1.0f;
  header.metadata.cursor_pos[1] = -1.0f;
  header.metadata.cursor_size = 0.05f;
  header.metadata.step_dt = 50e-15f;
  header.metadata.steps_per_frame = 100;
  header.metadata.box_width = 50e-9f;
  header.metadata.box_height = 50e-9f;
  header.metadata.data_structure = 1;  // MatrixBuckets
  header.metadata.device = 0;          // accelerator
  header.metadata.gpu_threads_per_block_log2 = 7;
  return header;
}

Frame frame_new(uint32_t particle_capacity) {
  Frame f = alloc_frame(packet_size(particle_capacity));
  f.len = sizeof(FrameHeader);
  *f.ptr = frame_header_init();
  return f;
}

void frame_destroy(Frame *frame) {
  if (frame->ptr != nullptr) {
    std::free(frame->ptr);
    frame->ptr = nullptr;
    frame->cap = 0;
    frame->len = 0;
  }
}

Particle *frame_particles(Frame *frame) {
  return reinterpret_cast<Particle *>(reinterpret_cast<uint8_t *>(frame->ptr) +
                                      sizeof(FrameHeader));
}

FrameMetadata *frame_metadata(Frame *frame) { return &frame->ptr->metadata; }

uint32_t frame_particle_count(const Frame *frame) { return frame->ptr->particle_count; }

bool frame_is_valid(const Frame *frame) {
  return frame->ptr != nullptr && frame->len >= sizeof(FrameHeader) &&
         std::memcmp(frame->ptr->signature_start, kSigStart, 4) == 0 &&
         std::memcmp(frame->ptr->signature_end, kSigEnd, 4) == 0;
}

void frame_push(Frame *frame, Particle particle) {
  ensure_capacity(frame, frame->len + sizeof(Particle));
  std::memcpy(reinterpret_cast<uint8_t *>(frame->ptr) + frame->len, &particle,
              sizeof(Particle));
  frame->len += sizeof(Particle);
  frame->ptr->particle_count += 1;
}

void frame_compact(FrameHeader *frame) {
  Particle *parts =
      reinterpret_cast<Particle *>(reinterpret_cast<uint8_t *>(frame) + sizeof(FrameHeader));
  uint32_t n = frame->particle_count;
  uint32_t kept = 0;
  for (uint32_t i = 0; i < n; ++i) {
    if (parts[i].ty >= 0) parts[kept++] = parts[i];
  }
  frame->particle_count = kept;
}

void frame_compact_into(FrameHeader *frame, FrameHeader *dst) {
  // metadata copied, dst's signatures left as-is (particle.rs:371-379)
  dst->metadata = frame->metadata;
  const Particle *sp = reinterpret_cast<const Particle *>(
      reinterpret_cast<const uint8_t *>(frame) + sizeof(FrameHeader));
  Particle *dp =
      reinterpret_cast<Particle *>(reinterpret_cast<uint8_t *>(dst) + sizeof(FrameHeader));
  uint32_t n = frame->particle_count;
  uint32_t kept = 0;
  for (uint32_t i = 0; i < n; ++i) {
    if (sp[i].ty >= 0) dp[kept++] = sp[i];
  }
  dst->particle_count = kept;
}

void frame_print(FrameHeader *frame) {
  std::fprintf(stderr, "--- Frame ---\n");
  if (std::memcmp(frame->signature_start, kSigStart, 4) != 0 ||
      std::memcmp(frame->signature_end, kSigEnd, 4) != 0)
    std::fprintf(stderr, "  signature error\n");
  const FrameMetadata &m = frame->metadata;
  std::fprintf(stderr, "  step dt = %g\n", m.step_dt);
  std::fprintf(stderr, "  steps per frame = %u\n", m.steps_per_frame);
  std::fprintf(stderr, "  box size = (%g, %g)\n", m.box_width, m.box_height);
  uint32_t n = frame->particle_count;
  std::fprintf(stderr, "  particles[%u]\n", n);
  const Particle *parts = reinterpret_cast<const Particle *>(
      reinterpret_cast<const uint8_t *>(frame) + sizeof(FrameHeader));
  for (uint32_t i = 0; i < n && i < 5; ++i) {
    std::fprintf(stderr, "    [%u] = x=%.2f%% y=%.2f%% vx=%g vy=%g ty=%d\n", i,
                 100.0 * parts[i].x / 4294967295.0, 100.0 * parts[i].y / 4294967295.0,
                 parts[i].vx, parts[i].vy, parts[i].ty);
  }
  std::fprintf(stderr, "-------------\n");
}

bool particle_is_null(Particle particle) { return particle.ty < 0; }

// ---- reader ----

bool reader_try_open_file(Reader *reader, const char *path) {
  FILE *fp = std::fopen(path, "rb");
  if (fp == nullptr) return false;
  auto *stream = new Stream();
  stream->fd = ::dup(::fileno(fp));
  std::fclose(fp);
  reader_slot(reader) = new ReaderImpl(stream);
  return true;
}

void reader_open_file(Reader *reader, const char *path) {
  if (!reader_try_open_file(reader, path)) {
    // the reference unwraps here (c_api/src/reader.rs:18-26): abort
    std::fprintf(stderr, "[particle_io] reader_open_file(%s) failed\n", path);
    std::abort();
  }
}

Frame reader_read(Reader *reader) {
  std::vector<uint8_t> bytes;
  if (reader_slot(reader)->pop_nonblocking(bytes) != 1) return Frame{nullptr, 0, 0};
  Frame f = alloc_frame(bytes.size());
  std::memcpy(f.ptr, bytes.data(), bytes.size());
  return f;
}

bool reader_read_blocking(Reader *reader, Frame *frame) {
  std::vector<uint8_t> bytes;
  if (!reader_slot(reader)->pop_blocking(bytes)) return false;
  frame_into(bytes, frame);
  return true;
}

bool reader_read_last(Reader *reader, Frame *frame) {
  std::vector<uint8_t> bytes;
  bool got = false;
  bool connected = reader_slot(reader)->pop_last(bytes, got);
  if (got) {
    *frame = alloc_frame(bytes.size());
    std::memcpy(frame->ptr, bytes.data(), bytes.size());
  } else {
    *frame = Frame{nullptr, 0, 0};
  }
  return connected;
}

void reader_destroy(Reader *reader) {
  delete reader_slot(reader);
  reader_slot(reader) = nullptr;
}

// ---- writer ----

bool writer_try_open_file(Writer *writer, const char *path) {
  FILE *fp = std::fopen(path, "wb");
  if (fp == nullptr) return false;
  auto *stream = new Stream();
  stream->fd = ::dup(::fileno(fp));
  std::fclose(fp);
  writer_slot(writer) = new WriterImpl(stream);
  return true;
}

void writer_open_file(Writer *writer, const char *path) {
  if (!writer_try_open_file(writer, path)) {
    // the reference unwraps here (c_api/src/writer.rs:21-29): abort
    std::fprintf(stderr, "[particle_io] writer_open_file(%s) failed\n", path);
    std::abort();
  }
}

bool writer_write(Writer *writer, FrameHeader *frame) {
  size_t total = packet_size(frame->particle_count);
  if (!writer_slot(writer)->stream->write_all(frame, total)) {
    std::fprintf(stderr, "[particle_io] write error\n");
    return false;
  }
  return true;
}

void writer_destroy(Writer *writer) {
  delete writer_slot(writer);
  writer_slot(writer) = nullptr;
}

// ---- TCP ----

bool new_tcp_client(Reader *reader, Writer *writer, const char *addr) {
  // split "host:port" at the last colon (tcp.rs's ToSocketAddrs form)
  const char *colon = std::strrchr(addr, ':');
  if (colon == nullptr || colon == addr) {
    std::fprintf(stderr, "[particle_io] bad address '%s' (want host:port)\n", addr);
    return false;
  }
  std::string host(addr, colon - addr);
  const char *port_str = colon + 1;

  addrinfo hints{};
  hints.ai_family = AF_INET;
  hints.ai_socktype = SOCK_STREAM;
  addrinfo *res = nullptr;
  if (::getaddrinfo(host.c_str(), port_str, &hints, &res) != 0) return false;
  int fd = -1;
  for (addrinfo *ai = res; ai != nullptr; ai = ai->ai_next) {
    fd = ::socket(ai->ai_family, ai->ai_socktype, ai->ai_protocol);
    if (fd < 0) continue;
    if (::connect(fd, ai->ai_addr, ai->ai_addrlen) == 0) break;
    ::close(fd);
    fd = -1;
  }
  ::freeaddrinfo(res);
  if (fd < 0) return false;
  int one = 1;
  ::setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));

  auto *stream = new Stream();
  stream->fd = fd;
  stream->refs.store(2);  // shared between reader and writer
  reader_slot(reader) = new ReaderImpl(stream);
  writer_slot(writer) = new WriterImpl(stream);
  return true;
}

}  // extern "C"
