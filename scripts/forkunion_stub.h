// Minimal serial stub of the fork_union C API, just enough to compile the
// reference's header-only engines for single-threaded oracle-vector
// generation. All parallel loops run inline on the caller.
#pragma once
#include <stddef.h>

typedef void *fu_topology_t;
typedef void *fu_pool_t;
typedef void *fu_lambda_context_t;

enum { fu_capabilities_all_k = 0, fu_caller_inclusive_k = 0 };

static inline fu_topology_t fu_topology_new(void) { static int t; return (fu_topology_t)&t; }
static inline void fu_topology_delete(fu_topology_t t) { (void)t; }
static inline size_t fu_logical_cores_count(fu_topology_t t) { (void)t; return 1; }
static inline fu_pool_t fu_pool_new(char const *name, int caps) { (void)name; (void)caps; static int p; return (fu_pool_t)&p; }
static inline void fu_pool_delete(fu_pool_t p) { (void)p; }
static inline int fu_pool_spawn(fu_topology_t t, fu_pool_t p, size_t threads, int mode) { (void)t; (void)p; (void)threads; (void)mode; return 1; }
static inline size_t fu_pool_threads_count(fu_pool_t p) { (void)p; return 1; }

typedef void (*fu_task_callback_t)(fu_lambda_context_t, size_t, size_t, size_t);
typedef void (*fu_slice_callback_t)(fu_lambda_context_t, size_t, size_t, size_t, size_t);
typedef void (*fu_thread_callback_t)(fu_lambda_context_t, size_t, size_t);

static inline void fu_pool_for_n(fu_pool_t p, size_t n, fu_task_callback_t cb, void *ctx) {
    (void)p;
    for (size_t i = 0; i < n; ++i) cb((fu_lambda_context_t)ctx, i, 0, 0);
}
static inline void fu_pool_for_n_dynamic(fu_pool_t p, size_t n, fu_task_callback_t cb, void *ctx) {
    (void)p;
    for (size_t i = 0; i < n; ++i) cb((fu_lambda_context_t)ctx, i, 0, 0);
}
static inline void fu_pool_for_slices(fu_pool_t p, size_t n, fu_slice_callback_t cb, void *ctx) {
    (void)p;
    cb((fu_lambda_context_t)ctx, 0, n, 0, 0);
}
static inline void fu_pool_for_threads(fu_pool_t p, fu_thread_callback_t cb, void *ctx) {
    (void)p;
    cb((fu_lambda_context_t)ctx, 0, 0);
}
