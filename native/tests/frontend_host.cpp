// ABI-compatibility host: drives particle_io.h exactly the way the reference
// simulator's native frontend does (cuda_simulator/src/lib/frontend.hpp:24-56
// — new_tcp_client("host:port"), reader_read_last with the null-ptr protocol,
// frame_compact/writer_write on raw FrameHeader*, destructor teardown). If
// this file compiles and links against our header unchanged, so does the
// reference's own frontend.
//
// Usage: frontend_host <host:port>
//   connects, waits for the first non-empty frame, echoes it back compacted,
//   then exits 0. Any protocol failure exits non-zero.

#include <particle_io.h>

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>

// host-side packet buffer, like the reference's kernel.h_frame
static constexpr uint32_t kMaxParticles = 1 << 16;
static uint8_t h_buffer[sizeof(FrameHeader) + kMaxParticles * sizeof(Particle)];
static FrameHeader *const h_frame = reinterpret_cast<FrameHeader *>(h_buffer);

static Reader reader;
static Writer writer;
static bool is_connected = false;

// Same shape as Frontend::read (frontend.hpp:35-47): newest-wins drain into a
// caller-owned Frame, copy into the host buffer, destroy the wire frame.
static bool frontend_read(FrameHeader *frame) {
  if (!is_connected) return false;

  Frame received_frame;
  received_frame.ptr = nullptr;

  is_connected = reader_read_last(&reader, &received_frame);
  if (!received_frame.ptr) return false;

  if (received_frame.ptr->particle_count > kMaxParticles) {
    std::fprintf(stderr, "frontend_host: frame exceeds host buffer\n");
    frame_destroy(&received_frame);
    return false;
  }
  std::memcpy(frame, received_frame.ptr, packet_size(received_frame.ptr->particle_count));
  frame_print(frame);
  frame_destroy(&received_frame);
  return true;
}

// Same shape as Frontend::write (frontend.hpp:49-56).
static void frontend_write(FrameHeader *frame) {
  if (!is_connected) return;

  frame_compact(frame);
  is_connected = writer_write(&writer, frame);
}

int main(int argc, char **argv) {
  if (argc != 2) {
    std::fprintf(stderr, "usage: %s <host:port>\n", argv[0]);
    return 2;
  }

  *h_frame = frame_header_init();
  is_connected = new_tcp_client(&reader, &writer, argv[1]);
  if (!is_connected) {
    std::fprintf(stderr, "frontend_host: connect failed\n");
    return 1;
  }

  // wait for the first non-empty frame (cuda_simulator.cu:43-49)
  int rc = 1;
  for (int spins = 0; is_connected && spins < 20000; ++spins) {
    if (frontend_read(h_frame) && h_frame->particle_count > 0) {
      frontend_write(h_frame);  // echo back, compacted
      rc = is_connected ? 0 : 1;
      break;
    }
    std::this_thread::sleep_for(std::chrono::milliseconds(1));
  }

  reader_destroy(&reader);
  writer_destroy(&writer);
  return rc;
}
