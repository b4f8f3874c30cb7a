// cluon::SharedMemory-compatible POSIX shared-memory frame transport.
//
// Wire-compatible with libcluon's POSIX flavor (the reference's live camera
// path, /root/reference/src/cfsd-state-estimation.cpp:99-132 +
// include/cluon-complete-v0.0.121.hpp:15005-15230): the /dev/shm segment
// starts with
//     struct SharedMemoryHeader {
//         uint32_t        __size;       // user-visible payload bytes
//         pthread_mutex_t __mutex;      // PROCESS_SHARED | ROBUST | NORMAL
//         pthread_cond_t  __condition;  // PROCESS_SHARED | CLOCK_MONOTONIC
//     };
// followed by __size bytes of payload. wait() == lock; cond_wait; unlock,
// notify_all() == cond_broadcast, and the sample timestamp rides on the shm
// file's mtime via futimens (cluon-complete:14721-14776). A process using
// this library can therefore consume frames published by a REAL cluon
// camera daemon, and our synthetic producer can feed a real cluon consumer.
//
// Exposed as a flat C ABI for the ctypes wrapper (pose_estimation_tpu/io/
// shm.py), mirroring native/ingest.cpp's pattern.

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <ctime>

#include <fcntl.h>
#include <pthread.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct SharedMemoryHeader {
    uint32_t __size;
    pthread_mutex_t __mutex;
    pthread_cond_t __condition;
};

struct Handle {
    int fd{-1};
    char *base{nullptr};            // mmap of header + payload
    SharedMemoryHeader *hdr{nullptr};
    uint32_t size{0};               // payload bytes
    bool created{false};
    char name[256]{};
};

}  // namespace

extern "C" {

// Create a new segment (producer). `name` must start with '/'. Returns
// nullptr on failure. An existing segment with the same name is replaced
// (same recovery cluon performs).
void *cluon_shm_create(const char *name, uint32_t size) {
    Handle *h = new Handle();
    h->created = true;
    std::snprintf(h->name, sizeof(h->name), "%s", name);
    int flags = O_RDWR | O_CREAT | O_EXCL;
    h->fd = ::shm_open(name, flags, S_IRUSR | S_IWUSR);
    if (h->fd == -1 && errno == EEXIST) {
        ::shm_unlink(name);
        h->fd = ::shm_open(name, flags, S_IRUSR | S_IWUSR);
    }
    if (h->fd == -1) { delete h; return nullptr; }
    if (::ftruncate(h->fd, static_cast<off_t>(sizeof(SharedMemoryHeader) + size)) != 0) {
        ::close(h->fd); ::shm_unlink(name); delete h; return nullptr;
    }
    h->base = static_cast<char *>(::mmap(
        nullptr, sizeof(SharedMemoryHeader) + size,
        PROT_READ | PROT_WRITE, MAP_SHARED, h->fd, 0));
    if (h->base == MAP_FAILED) {
        ::close(h->fd); ::shm_unlink(name); delete h; return nullptr;
    }
    h->hdr = reinterpret_cast<SharedMemoryHeader *>(h->base);
    h->size = size;
    h->hdr->__size = size;

    pthread_mutexattr_t ma;
    ::pthread_mutexattr_init(&ma);
    ::pthread_mutexattr_setpshared(&ma, PTHREAD_PROCESS_SHARED);
    ::pthread_mutexattr_setrobust(&ma, PTHREAD_MUTEX_ROBUST);
    ::pthread_mutexattr_settype(&ma, PTHREAD_MUTEX_NORMAL);
    ::pthread_mutex_init(&h->hdr->__mutex, &ma);
    ::pthread_mutexattr_destroy(&ma);

    pthread_condattr_t ca;
    ::pthread_condattr_init(&ca);
    ::pthread_condattr_setclock(&ca, CLOCK_MONOTONIC);
    ::pthread_condattr_setpshared(&ca, PTHREAD_PROCESS_SHARED);
    ::pthread_cond_init(&h->hdr->__condition, &ca);
    ::pthread_condattr_destroy(&ca);

    ::mlock(h->base, sizeof(SharedMemoryHeader) + size);
    return h;
}

// Attach to an existing segment (consumer). Returns nullptr on failure.
void *cluon_shm_attach(const char *name) {
    Handle *h = new Handle();
    std::snprintf(h->name, sizeof(h->name), "%s", name);
    h->fd = ::shm_open(name, O_RDWR, S_IRUSR | S_IWUSR);
    if (h->fd == -1) { delete h; return nullptr; }
    // map the header first to learn the payload size, then remap fully
    void *m0 = ::mmap(nullptr, sizeof(SharedMemoryHeader),
                      PROT_READ | PROT_WRITE, MAP_SHARED, h->fd, 0);
    if (m0 == MAP_FAILED) { ::close(h->fd); delete h; return nullptr; }
    uint32_t size = reinterpret_cast<SharedMemoryHeader *>(m0)->__size;
    ::munmap(m0, sizeof(SharedMemoryHeader));
    h->base = static_cast<char *>(::mmap(
        nullptr, sizeof(SharedMemoryHeader) + size,
        PROT_READ | PROT_WRITE, MAP_SHARED, h->fd, 0));
    if (h->base == MAP_FAILED) { ::close(h->fd); delete h; return nullptr; }
    h->hdr = reinterpret_cast<SharedMemoryHeader *>(h->base);
    h->size = size;
    return h;
}

uint32_t cluon_shm_size(void *p) { return static_cast<Handle *>(p)->size; }

char *cluon_shm_data(void *p) {
    Handle *h = static_cast<Handle *>(p);
    return h->base + sizeof(SharedMemoryHeader);
}

int cluon_shm_lock(void *p) {
    Handle *h = static_cast<Handle *>(p);
    int rc = ::pthread_mutex_lock(&h->hdr->__mutex);
    if (rc == EOWNERDEAD) {  // robust-mutex recovery like cluon's lockPOSIX
        ::pthread_mutex_consistent(&h->hdr->__mutex);
        rc = 0;
    }
    return rc;
}

int cluon_shm_unlock(void *p) {
    return ::pthread_mutex_unlock(&static_cast<Handle *>(p)->hdr->__mutex);
}

// cluon's wait(): lock, cond_wait, unlock. A timeout (ms) variant is
// provided so Python consumers cannot hang forever on a dead producer;
// timeout_ms <= 0 waits indefinitely (exact cluon semantics).
// Returns 0 = notified, 1 = timeout, <0 = error.
int cluon_shm_wait(void *p, int timeout_ms) {
    Handle *h = static_cast<Handle *>(p);
    int rc = cluon_shm_lock(p);
    if (rc != 0) return -rc;
    if (timeout_ms <= 0) {
        rc = ::pthread_cond_wait(&h->hdr->__condition, &h->hdr->__mutex);
    } else {
        struct timespec ts;
        ::clock_gettime(CLOCK_MONOTONIC, &ts);
        ts.tv_sec += timeout_ms / 1000;
        ts.tv_nsec += static_cast<long>(timeout_ms % 1000) * 1000000L;
        if (ts.tv_nsec >= 1000000000L) { ts.tv_sec += 1; ts.tv_nsec -= 1000000000L; }
        rc = ::pthread_cond_timedwait(&h->hdr->__condition, &h->hdr->__mutex, &ts);
    }
    cluon_shm_unlock(p);
    if (rc == ETIMEDOUT) return 1;
    return rc == 0 ? 0 : -rc;
}

int cluon_shm_notify_all(void *p) {
    return ::pthread_cond_broadcast(&static_cast<Handle *>(p)->hdr->__condition);
}

// Sample timestamp rides on the shm file's mtime (cluon setTimeStamp /
// getTimeStamp, cluon-complete:14721-14776).
int cluon_shm_set_timestamp(void *p, int64_t seconds, int32_t micros) {
    Handle *h = static_cast<Handle *>(p);
    struct timespec times[2];
    times[0].tv_sec = seconds; times[0].tv_nsec = micros * 1000L;
    times[1].tv_sec = seconds; times[1].tv_nsec = micros * 1000L;
    return ::futimens(h->fd, times);
}

int cluon_shm_get_timestamp(void *p, int64_t *seconds, int32_t *micros) {
    Handle *h = static_cast<Handle *>(p);
    struct stat st;
    if (::fstat(h->fd, &st) != 0) return -errno;
    *seconds = static_cast<int64_t>(st.st_mtim.tv_sec);
    *micros = static_cast<int32_t>(st.st_mtim.tv_nsec / 1000);
    return 0;
}

void cluon_shm_close(void *p, int unlink_segment) {
    Handle *h = static_cast<Handle *>(p);
    if (h->base && h->base != MAP_FAILED) {
        ::munmap(h->base, sizeof(SharedMemoryHeader) + h->size);
    }
    if (h->fd != -1) ::close(h->fd);
    if (unlink_segment) ::shm_unlink(h->name);
    delete h;
}

}  // extern "C"
