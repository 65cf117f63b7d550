// Native frame ring buffer: the decode→device staging queue.
//
// Replaces the reference's multiprocessing.Queue + re-decode producer/consumer
// pair (reference backend/tools/subtitle_ocr.py:164-240, bounded queue of 20
// at :225) with an in-process lock-guarded ring of fixed-size frame slots:
// the host decoder thread writes raw frames into slots; the device-feed
// thread pops a whole contiguous batch (single memcpy per slot into the
// batch staging buffer handed to jax.device_put). No pickling, no process
// hop, no second decode of the same frame.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <vector>

namespace {

struct Ring {
  size_t slot_bytes;
  size_t n_slots;
  std::vector<uint8_t> data;
  std::vector<int64_t> frame_no;   // per-slot metadata
  std::vector<double> ts_ms;       // per-slot metadata
  size_t head = 0;  // next write
  size_t tail = 0;  // next read
  size_t count = 0;
  bool closed = false;
  std::mutex mu;
  std::condition_variable cv_space;
  std::condition_variable cv_data;
};

}  // namespace

extern "C" {

void* vse_ring_create(size_t slot_bytes, size_t n_slots) {
  Ring* r = new Ring();
  r->slot_bytes = slot_bytes;
  r->n_slots = n_slots;
  r->data.resize(slot_bytes * n_slots);
  r->frame_no.resize(n_slots);
  r->ts_ms.resize(n_slots);
  return r;
}

void vse_ring_destroy(void* h) { delete static_cast<Ring*>(h); }

// Blocking push of one frame. Returns 0 on success, -1 if the ring is closed.
int vse_ring_push(void* h, const uint8_t* frame, size_t bytes,
                  int64_t frame_no, double ts_ms) {
  Ring* r = static_cast<Ring*>(h);
  std::unique_lock<std::mutex> lk(r->mu);
  r->cv_space.wait(lk, [&] { return r->count < r->n_slots || r->closed; });
  if (r->closed) return -1;
  size_t slot = r->head;
  std::memcpy(r->data.data() + slot * r->slot_bytes, frame,
              bytes < r->slot_bytes ? bytes : r->slot_bytes);
  r->frame_no[slot] = frame_no;
  r->ts_ms[slot] = ts_ms;
  r->head = (r->head + 1) % r->n_slots;
  ++r->count;
  lk.unlock();
  r->cv_data.notify_one();
  return 0;
}

// Pop up to batch_n frames into a contiguous dst buffer
// [batch_n * slot_bytes]; blocks until at least one frame (or close).
// Returns the number of frames copied (0 => closed and drained).
int vse_ring_pop_batch(void* h, uint8_t* dst, int batch_n,
                       int64_t* frame_nos, double* ts_out) {
  Ring* r = static_cast<Ring*>(h);
  std::unique_lock<std::mutex> lk(r->mu);
  r->cv_data.wait(lk, [&] { return r->count > 0 || r->closed; });
  int got = 0;
  while (got < batch_n && r->count > 0) {
    size_t slot = r->tail;
    std::memcpy(dst + static_cast<size_t>(got) * r->slot_bytes,
                r->data.data() + slot * r->slot_bytes, r->slot_bytes);
    frame_nos[got] = r->frame_no[slot];
    ts_out[got] = r->ts_ms[slot];
    r->tail = (r->tail + 1) % r->n_slots;
    --r->count;
    ++got;
  }
  lk.unlock();
  r->cv_space.notify_all();
  return got;
}

// Number of frames currently queued.
int vse_ring_size(void* h) {
  Ring* r = static_cast<Ring*>(h);
  std::lock_guard<std::mutex> lk(r->mu);
  return static_cast<int>(r->count);
}

// Mark the ring closed: pushers get -1, poppers drain then get 0.
void vse_ring_close(void* h) {
  Ring* r = static_cast<Ring*>(h);
  {
    std::lock_guard<std::mutex> lk(r->mu);
    r->closed = true;
  }
  r->cv_space.notify_all();
  r->cv_data.notify_all();
}

}  // extern "C"
