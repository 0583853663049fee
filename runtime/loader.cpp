// Native batch assembler for the host data pipeline.
//
// The reference delegates host-side batching to PyTorch's C++ DataLoader
// (worker processes + pinned-memory collation).  This is the TPU build's
// equivalent: a background-thread batch assembler over the in-memory uint8
// arrays of a split, producing contiguous (B,H,W,3)+(B,H,W) buffers into a
// preallocated ring while Python/JAX run ahead (the GIL is never held here).
//
// Semantics mirror image_segmentation_tpu/data/pipeline.py:
//   - virtual index replication: each base item appears (aug+1) times/epoch
//     (reference customDatasets/datasets.py:150-160);
//   - per-epoch Fisher-Yates shuffle keyed on (seed, epoch) — own RNG stream
//     (mt19937_64), distribution-equivalent to the Python pipeline's;
//   - per-process strided sharding of each global batch.
//
// C ABI only; driven from Python via ctypes (no pybind11 in this image).

#include <atomic>
#include <memory>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

namespace {

struct RingSlot {
  std::vector<uint8_t> images;
  std::vector<uint8_t> masks;
  int64_t batch_items = 0;   // actual items in this slot (remainder batches)
  std::atomic<bool> ready{false};
  std::atomic<bool> consumed{true};
};

struct Loader {
  // Dataset views (owned by Python; must outlive the loader).
  const uint8_t* images = nullptr;
  const uint8_t* masks = nullptr;
  int64_t n_items = 0;
  int64_t item_bytes = 0;   // H*W*C
  int64_t mask_bytes = 0;   // H*W

  // Config.
  int64_t global_batch = 0;
  int64_t replication = 1;  // augmentations_per_datapoint + 1
  int64_t proc_index = 0;
  int64_t proc_count = 1;
  bool shuffle = true;
  bool drop_last = true;
  uint64_t seed = 0;

  // Epoch state.
  std::vector<int64_t> order;
  int64_t num_batches = 0;

  // Ring (unique_ptr: RingSlot holds atomics and is not movable).
  std::vector<std::unique_ptr<RingSlot>> ring;
  std::atomic<int64_t> produced{0};
  std::atomic<int64_t> consumed_count{0};
  std::atomic<bool> stop{false};
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_producer;
  std::condition_variable cv_consumer;

  // Ceil, not floor: when global_batch % proc_count != 0 the strided shard
  // of proc_index < remainder holds one extra item; floor-sized slots would
  // overflow in fill_slot.
  int64_t items_per_proc_batch() const {
    return (global_batch + proc_count - 1) / proc_count;
  }

  void build_epoch(uint64_t epoch) {
    const int64_t virt = n_items * replication;
    order.resize(virt);
    for (int64_t i = 0; i < virt; ++i) order[i] = i / replication;
    if (shuffle) {
      std::mt19937_64 rng(seed * 0x9E3779B97F4A7C15ULL + epoch + 1);
      for (int64_t i = virt - 1; i > 0; --i) {
        std::uniform_int_distribution<int64_t> dist(0, i);
        std::swap(order[i], order[dist(rng)]);
      }
    }
    num_batches = drop_last ? virt / global_batch
                            : (virt + global_batch - 1) / global_batch;
  }

  void fill_slot(RingSlot& slot, int64_t batch_idx) {
    const int64_t start = batch_idx * global_batch;
    const int64_t end =
        std::min<int64_t>(start + global_batch, (int64_t)order.size());
    int64_t out = 0;
    for (int64_t j = start + proc_index; j < end; j += proc_count) {
      const int64_t src = order[j];
      std::memcpy(slot.images.data() + out * item_bytes,
                  images + src * item_bytes, item_bytes);
      std::memcpy(slot.masks.data() + out * mask_bytes,
                  masks + src * mask_bytes, mask_bytes);
      ++out;
    }
    slot.batch_items = out;
  }

  void run() {
    for (int64_t b = 0; b < num_batches && !stop.load(); ++b) {
      RingSlot& slot = *ring[b % ring.size()];
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_producer.wait(lk, [&] {
          return slot.consumed.load() || stop.load();
        });
      }
      if (stop.load()) return;
      fill_slot(slot, b);
      {
        // State changes must happen under the mutex: flipping ready/consumed
        // outside it can race the consumer's predicate check and lose the
        // (single) wakeup for this slot, hanging the waiter forever.
        std::lock_guard<std::mutex> lk(mu);
        slot.consumed.store(false);
        slot.ready.store(true);
        produced.fetch_add(1);
      }
      cv_consumer.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* loader_new(const uint8_t* images, const uint8_t* masks, int64_t n_items,
                 int64_t item_bytes, int64_t mask_bytes, int64_t global_batch,
                 int64_t replication, int64_t proc_index, int64_t proc_count,
                 int shuffle, int drop_last, uint64_t seed, int64_t ring_depth) {
  auto* l = new Loader();
  l->images = images;
  l->masks = masks;
  l->n_items = n_items;
  l->item_bytes = item_bytes;
  l->mask_bytes = mask_bytes;
  l->global_batch = global_batch;
  l->replication = replication;
  l->proc_index = proc_index;
  l->proc_count = proc_count;
  l->shuffle = shuffle != 0;
  l->drop_last = drop_last != 0;
  l->seed = seed;
  // num_batches is a pure function of the config; make it available before
  // the first epoch starts.
  const int64_t virt = n_items * replication;
  l->num_batches = l->drop_last ? virt / global_batch
                                : (virt + global_batch - 1) / global_batch;
  const int64_t depth = ring_depth > 0 ? ring_depth : 3;
  const int64_t per_proc = l->items_per_proc_batch();
  for (int64_t i = 0; i < depth; ++i) {
    auto slot = std::make_unique<RingSlot>();
    slot->images.resize(per_proc * item_bytes);
    slot->masks.resize(per_proc * mask_bytes);
    l->ring.push_back(std::move(slot));
  }
  return l;
}

// Begin producing batches for one epoch.  Joins any previous epoch thread.
void loader_start_epoch(void* handle, uint64_t epoch) {
  auto* l = static_cast<Loader*>(handle);
  if (l->worker.joinable()) {
    l->stop.store(true);
    l->cv_producer.notify_all();
    l->worker.join();
  }
  l->stop.store(false);
  l->produced.store(0);
  l->consumed_count.store(0);
  for (auto& s : l->ring) {
    s->ready.store(false);
    s->consumed.store(true);
  }
  l->build_epoch(epoch);
  l->worker = std::thread([l] { l->run(); });
}

int64_t loader_num_batches(void* handle) {
  return static_cast<Loader*>(handle)->num_batches;
}

// Blocks until the next batch is assembled.  Returns the ring slot index and
// the number of valid items, or -1 when the epoch is exhausted.
int64_t loader_next(void* handle, const uint8_t** images_out,
                    const uint8_t** masks_out, int64_t* items_out) {
  auto* l = static_cast<Loader*>(handle);
  const int64_t idx = l->consumed_count.load();
  if (idx >= l->num_batches) return -1;
  RingSlot& slot = *l->ring[idx % l->ring.size()];
  {
    std::unique_lock<std::mutex> lk(l->mu);
    l->cv_consumer.wait(lk, [&] { return slot.ready.load(); });
  }
  *images_out = slot.images.data();
  *masks_out = slot.masks.data();
  *items_out = slot.batch_items;
  return idx % (int64_t)l->ring.size();
}

// Mark a slot free for reuse once its contents have been copied to device.
void loader_release(void* handle, int64_t slot_idx) {
  auto* l = static_cast<Loader*>(handle);
  RingSlot& slot = *l->ring[slot_idx];
  {
    // Same lost-wakeup discipline as the producer: flip state under the
    // mutex so the producer's predicate check cannot miss the transition.
    std::lock_guard<std::mutex> lk(l->mu);
    slot.ready.store(false);
    slot.consumed.store(true);
    l->consumed_count.fetch_add(1);
  }
  l->cv_producer.notify_all();
}

void loader_free(void* handle) {
  auto* l = static_cast<Loader*>(handle);
  l->stop.store(true);
  l->cv_producer.notify_all();
  if (l->worker.joinable()) l->worker.join();
  delete l;
}

}  // extern "C"
