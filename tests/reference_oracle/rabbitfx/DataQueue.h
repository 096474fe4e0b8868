// Minimal functional stub for RabbitFX's TDataQueue (test oracle only):
// bounded thread-safe FIFO with producer-completion signalling, matching the
// call sites FaChunkQueue(128, 1) / Push(id, ptr) / Pop(id, ptr) /
// SetCompleted() (reference SketchInfo.cpp:157-175).
#ifndef RTC_STUB_DATAQUEUE_H
#define RTC_STUB_DATAQUEUE_H

#include <condition_variable>
#include <cstdint>
#include <deque>
#include <mutex>
#include <utility>

#include "FastxChunk.h"

namespace rabbit {
namespace core {

template <typename T>
class TDataQueue {
  public:
    TDataQueue(size_t maxSize = 128, int /*producers*/ = 1)
        : max_size_(maxSize) {}

    void Push(int64 id, T *item) {
        std::unique_lock<std::mutex> lk(mu_);
        cv_space_.wait(lk, [&] { return q_.size() < max_size_; });
        q_.emplace_back(id, item);
        cv_item_.notify_all();
    }

    bool Pop(int64 &id, T *&item) {
        std::unique_lock<std::mutex> lk(mu_);
        cv_item_.wait(lk, [&] { return !q_.empty() || done_; });
        if (q_.empty()) return false;
        id = q_.front().first;
        item = q_.front().second;
        q_.pop_front();
        cv_space_.notify_all();
        return true;
    }

    void SetCompleted() {
        std::lock_guard<std::mutex> lk(mu_);
        done_ = true;
        cv_item_.notify_all();
    }

  private:
    std::mutex mu_;
    std::condition_variable cv_item_, cv_space_;
    std::deque<std::pair<int64, T *>> q_;
    size_t max_size_;
    bool done_ = false;
};

}  // namespace core
}  // namespace rabbit

#endif
