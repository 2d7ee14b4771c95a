/* particle_io — C ABI for the particle frame wire format and transport.
 *
 * A from-scratch C++ implementation of the interface the reference generates
 * with cbindgen from its Rust c_api crate (reference: particle_io/c_api/,
 * build.rs:10-24), so native hosts (and the reference CUDA simulator itself)
 * can link against the TPU engine's protocol layer unchanged.
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
 * (reference: particle_io/c_api/src/particle.rs:6-63). */
typedef struct Frame {
  FrameHeader *ptr;
  size_t cap; /* capacity in bytes */
  size_t len; /* length in bytes   */
} Frame;

/* Opaque handles sized/aligned like the reference's [u64; 2] boxes
 * (reference: particle_io/c_api/src/reader.rs, writer.rs). */
typedef struct Reader {
  uint64_t opaque[2];
} Reader;

typedef struct Writer {
  uint64_t opaque[2];
} Writer;

/* ---- frame functions (reference: c_api/src/particle.rs:65-116) ---- */

/* Total packet bytes for a frame with `particle_count` particles. */
size_t packet_size(uint32_t particle_count);

/* Initialize a header in place: signatures, zero count, default metadata. */
void frame_header_init(FrameHeader *header);

/* Free a frame's buffer. Idempotent: ptr is nulled. */
void frame_destroy(Frame *frame);

/* Allocate a frame with capacity for `particle_capacity` particles. */
Frame frame_new(uint32_t particle_capacity);

/* Accessors over the raw buffer. */
Particle *frame_particles(Frame *frame);
FrameMetadata *frame_metadata(Frame *frame);
uint32_t frame_particle_count(const Frame *frame);
bool frame_is_valid(const Frame *frame);

/* Append a particle (reallocates as needed). */
void frame_push(Frame *frame, Particle particle);

/* Drop null (ty < 0) particles in place, preserving order
 * (reference: particle_io/src/particle.rs:349-368). */
void frame_compact(Frame *frame);

/* Compact non-null particles of `src` into `dst` (metadata copied too). */
void frame_compact_into(const Frame *src, Frame *dst);

/* Human-readable dump to stderr (reference: particle.rs:246-286). */
void frame_print(const Frame *frame);

bool particle_is_null(const Particle *particle);

/* ---- reader (bg-thread stream reader, newest-wins drain) ---- */

/* Open a file-backed reader. Returns false on open failure. */
bool reader_open_file(Reader *reader, const char *path);

/* Blocking-read the next frame into *frame (replacing its buffer).
 * Returns false when the stream is disconnected/exhausted. */
bool reader_read(Reader *reader, Frame *frame);

/* Drain all pending frames, keep only the newest
 * (reference: c_api/src/reader.rs:51-63). Returns false on disconnect
 * with nothing pending. Sets *got to whether a frame was written. */
bool reader_read_last(Reader *reader, Frame *frame, bool *got);

void reader_destroy(Reader *reader);

/* ---- writer ---- */

bool writer_open_file(Writer *writer, const char *path);

/* Blocking write of the whole frame. false + stderr message on error. */
bool writer_write(Writer *writer, const Frame *frame);

void writer_destroy(Writer *writer);

/* ---- TCP ---- */

/* Connect to the editor's server; on success placement-initializes
 * reader+writer over the shared socket (reference: c_api/src/tcp.rs:10-34). */
bool new_tcp_client(const char *host, uint16_t port, Reader *reader, Writer *writer);

#ifdef __cplusplus
} /* extern "C" */
#endif

#endif /* PARTICLE_IO_H */
