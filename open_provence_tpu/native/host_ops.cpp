// Native host-side ops for the OpenProvence-TPU inference engine.
//
// The reference's host pipeline leans on native code through its
// dependencies (Rust tokenizers, torch DataLoader workers — SURVEY §2.3);
// this framework's own host hot paths are implemented here:
//
//  * find_subsequence — token-range recovery by subsequence search inside
//    prepared block inputs (reference standalone:2159-2170, O(n·m) scan per
//    block, the inner loop of _prepare_block_inputs),
//  * greedy_pack — fragment→block greedy packing plan
//    (reference standalone:2222-2259),
//  * pad_block_batch_i32 — fill padded [batch, seq] id/mask arrays from
//    ragged rows (reference pad-to-max loop standalone:2832-2880).
//
// Build: g++ -O3 -shared -fPIC host_ops.cpp -o libhost_ops.so
// Python binds via ctypes (open_provence_tpu/native/__init__.py), with pure
// Python fallbacks kept behavior-identical (tests/test_native_ops.py).

#include <cstdint>
#include <cstring>

extern "C" {

// Return the first index where `needle` occurs in `haystack`, else -1.
int32_t op_find_subsequence(const int32_t* haystack, int32_t n,
                            const int32_t* needle, int32_t m) {
    if (m <= 0 || n < m) return -1;
    const int32_t first = needle[0];
    const int32_t limit = n - m;
    for (int32_t i = 0; i <= limit; ++i) {
        if (haystack[i] != first) continue;
        int32_t j = 1;
        for (; j < m; ++j) {
            if (haystack[i + j] != needle[j]) break;
        }
        if (j == m) return i;
    }
    return -1;
}

// Greedy packing plan. Inputs: fragment token lengths. Outputs:
//   block_ids[i]  — block index assigned to fragment i,
//   new_lens[i]   — fragment length after truncation (== lens[i] unless the
//                   fragment alone exceeds capacity, then min(len, capacity)
//                   with capacity = max(1, available - base)).
// Returns the number of blocks.
int32_t op_greedy_pack(const int32_t* lens, int32_t n_fragments,
                       int32_t base_len, int32_t available_len,
                       int32_t* block_ids, int32_t* new_lens) {
    if (n_fragments <= 0) return 0;
    int32_t capacity = available_len - base_len;
    if (capacity < 1) capacity = 1;

    int32_t block = 0;
    int32_t current_len = base_len;
    bool block_open = false;
    for (int32_t i = 0; i < n_fragments; ++i) {
        int32_t len = lens[i];
        if (current_len + len <= available_len) {
            block_ids[i] = block;
            new_lens[i] = len;
            current_len += len;
            block_open = true;
            continue;
        }
        if (block_open) {
            ++block;
            block_open = false;
            current_len = base_len;
        }
        int32_t truncated = len > capacity ? capacity : len;
        block_ids[i] = block;
        new_lens[i] = truncated;
        current_len = base_len + truncated;
        block_open = true;
    }
    return block + 1;
}

// Fill input_ids [batch, seq] (pre-filled with pad) and attention
// [batch, seq] (pre-zeroed) from a flat ragged buffer of rows.
void op_pad_block_batch_i32(const int32_t* flat_ids, const int32_t* row_lens,
                            int32_t n_rows, int32_t seq_len,
                            int32_t* input_ids, int32_t* attention) {
    int64_t cursor = 0;
    for (int32_t r = 0; r < n_rows; ++r) {
        int32_t len = row_lens[r];
        int32_t copy_len = len < seq_len ? len : seq_len;
        std::memcpy(input_ids + (int64_t)r * seq_len, flat_ids + cursor,
                    (size_t)copy_len * sizeof(int32_t));
        for (int32_t c = 0; c < copy_len; ++c) {
            attention[(int64_t)r * seq_len + c] = 1;
        }
        cursor += len;
    }
}

}  // extern "C"
