/* particle_io — C ABI for the particle frame wire format and transport.
 *
 * A from-scratch C++ implementation of the interface the reference generates
 * with cbindgen from its Rust c_api crate (reference: particle_io/c_api/,
 * build.rs:10-24). The REFERENCE-IDENTICAL section below is signature-exact:
 * a native host written against the reference's generated particle_io.h (for
 * example the reference simulator's frontend, cuda_simulator/src/lib/
 * frontend.hpp) compiles and links against this header unchanged. Extra
 * convenience entry points live in the EXTENSIONS section under names the
 * reference does not use.
 *
 * Wire format (reference: particle_io/src/particle.rs:12-238):
 *   packet  = 96-byte header + particle_count * 20-byte particles
 *   header  = start signature 36 bc e9 bd | u32 particle_count
 *             | 80-byte metadata | end signature ac c4 12 ec | 4 pad bytes
 *   particle = u32 x | u32 y | f32 vx | f32 vy | i32 ty   (ty < 0 = null)
 */

#ifndef PARTICLE_IO_H
#define PARTICLE_IO_H

#include <stdbool.h>
#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* ---- wire structs (packed exactly like the Rust #[repr(C)] originals) ---- */

typedef struct MiePotentialParams {
  float sigma;   /* distance at which the potential is zero (m) */
  float epsilon; /* dispersion energy (J) */
  float n;       /* repulsive exponent */
  float m;       /* attractive exponent */
} MiePotentialParams;

typedef struct FrameMetadata {
  MiePotentialParams particles[2];
  float cursor_pos[2];
  float cursor_size;
  float step_dt;
  uint32_t steps_per_frame;
  float box_width;
  float box_height;
  uint32_t data_structure; /* 0 = CompactArray, 1 = MatrixBuckets */
  uint32_t device;         /* 0 = Gpu/accelerator, 1 = CpuThreadPool, 2 = CpuMainThread */
  uint32_t gpu_threads_per_block_log2;
  uint32_t padding[2];
} FrameMetadata;

typedef struct FrameHeader {
  uint8_t signature_start[4]; /* 36 bc e9 bd */
  uint32_t particle_count;
  FrameMetadata metadata;
  uint8_t signature_end[4]; /* ac c4 12 ec */
  uint32_t padding;
} FrameHeader;

typedef struct Particle {
  uint32_t x; /* u32 fixed point spanning [0, box_width) */
  uint32_t y;
  float vx; /* m/s */
  float vy;
  int32_t ty; /* species; < 0 means null/tombstone */
} Particle;

/* Frame = an owned byte buffer holding header + particles
 * (reference: particle_io/c_api/src/particle.rs:4-10). ptr == NULL means
 * "no frame". cap/len are in bytes. */
typedef struct Frame {
  FrameHeader *ptr;
  uintptr_t cap;
  uintptr_t len;
} Frame;

/* Opaque handles sized/aligned like the reference's [u64; 2] repr(C) boxes
 * (reference: particle_io/c_api/src/reader.rs:8-13, writer.rs:10-15). */
typedef struct Reader {
  uint64_t opaque[2];
} Reader;

typedef struct Writer {
  uint64_t opaque[2];
} Writer;

/* ===========================================================================
 * REFERENCE-IDENTICAL SURFACE — signatures match the reference's cbindgen
 * output function for function (particle_io/c_api/src/{particle,reader,
 * writer,tcp}.rs). Do not change these without changing the reference.
 * ======================================================================== */

/* Total packet bytes for a frame with `particle_count` particles. */
uintptr_t packet_size(uint32_t particle_count);

/* A header with valid signatures, zero count and default metadata
 * (reference: c_api/src/particle.rs:109-112). */
FrameHeader frame_header_init(void);

/* Free a frame's buffer. Idempotent: ptr is nulled
 * (reference: c_api/src/particle.rs:66-76). */
void frame_destroy(Frame *frame);

/* Human-readable dump of the packet at `frame` (reference:
 * c_api/src/particle.rs:80-86; length implied by particle_count). */
void frame_print(FrameHeader *frame);

/* Drop null (ty < 0) particles in place, preserving order
 * (reference: c_api/src/particle.rs:90-96 -> particle.rs:349-368). */
void frame_compact(FrameHeader *frame);

/* Compact non-null particles of `frame` into `dst` (metadata copied, dst's
 * signatures left as-is). `dst` must have capacity for `frame`'s live
 * particles (reference: c_api/src/particle.rs:100-107 -> particle.rs:371-379). */
void frame_compact_into(FrameHeader *frame, FrameHeader *dst);

bool particle_is_null(Particle particle);

/* Placement-initialize a file-backed reader. Aborts on open failure (the
 * reference unwraps, c_api/src/reader.rs:18-26). */
void reader_open_file(Reader *reader, const char *path);

/* Non-blocking: newest-unread frame as a fresh allocation, or a null frame
 * ({NULL,0,0}) when nothing is pending (reference: c_api/src/reader.rs:40-45;
 * where the reference unwrap-aborts on disconnect, this returns the null
 * frame). Caller owns the result: frame_destroy it. */
Frame reader_read(Reader *reader);

/* Drain all pending frames and overwrite *frame with the NEWEST one as a
 * fresh allocation (or the null frame if none were pending). Returns false
 * iff the stream is disconnected once drained
 * (reference: c_api/src/reader.rs:47-63; consumed by frontend.hpp:35-47).
 * The previous contents of *frame are NOT freed — callers pass a null frame
 * and frame_destroy the result, as the reference's frontend does. */
bool reader_read_last(Reader *reader, Frame *frame);

void reader_destroy(Reader *reader);

/* Placement-initialize a file-backed writer. Aborts on open failure
 * (reference: c_api/src/writer.rs:21-29). */
void writer_open_file(Writer *writer, const char *path);

/* Blocking write of packet_size(frame->particle_count) bytes. Returns false
 * (with a stderr note) on error (reference: c_api/src/writer.rs:40-55). */
bool writer_write(Writer *writer, FrameHeader *frame);

void writer_destroy(Writer *writer);

/* Connect to the editor's TCP server at `addr` ("host:port"); on success
 * placement-initializes reader+writer over the shared socket. Returns false
 * (with a stderr note) on failure (reference: c_api/src/tcp.rs:10-34). */
bool new_tcp_client(Reader *reader, Writer *writer, const char *addr);

/* ===========================================================================
 * EXTENSIONS — convenience entry points this implementation adds (names
 * disjoint from the reference surface; used by the Python ctypes binding
 * and the tests).
 * ======================================================================== */

/* Allocate a frame with capacity for `particle_capacity` particles and a
 * default-initialized header. */
Frame frame_new(uint32_t particle_capacity);

/* Accessors over a frame's raw buffer. */
Particle *frame_particles(Frame *frame);
FrameMetadata *frame_metadata(Frame *frame);
uint32_t frame_particle_count(const Frame *frame);
bool frame_is_valid(const Frame *frame);

/* Append a particle (reallocates as needed). */
void frame_push(Frame *frame, Particle particle);

/* Blocking read of the next frame in stream order into *frame (replacing its
 * buffer contents, reusing its allocation). Returns false when the stream is
 * disconnected and exhausted. */
bool reader_read_blocking(Reader *reader, Frame *frame);

/* Non-aborting variants of the open calls: return false on failure. */
bool reader_try_open_file(Reader *reader, const char *path);
bool writer_try_open_file(Writer *writer, const char *path);

#ifdef __cplusplus
} /* extern "C" */
#endif

#endif /* PARTICLE_IO_H */
